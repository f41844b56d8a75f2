"""Per-tile entropy streams.

The reference codes each frame as ONE range-coded stream, which makes
the entropy pass inherently serial (od_ec_enc in encode.c drives every
symbol in superblock raster order).  This framework instead splits a
frame into horizontal tiles — contiguous groups of superblock rows —
each with its OWN range coder and its OWN adaptation state, so the
per-symbol pass parallelizes across tiles on the host and, later, on
device cores.  This is the frame-level analogue of the GOP-level split
(dist/gop.py): keyframes cut inter-frame adaptation, tiles cut
intra-frame adaptation.

Independence contract (both sides must agree):
  * every predictor/context that reads ABOVE the tile's first SB row is
    cut (treated as frame-top): SB-DC neighbor prediction, H/V intra
    prediction, MV median prediction, dering flag contexts;
  * CfL and Haar-DC gradients never cross an SB row, so they need no
    cut;
  * frame-level DATA passes (transforms, lapping, motion compensation,
    dering filtering, smoothing) still see the whole frame — only the
    SYMBOL streams are independent.  The decoder therefore runs in
    phases: per-tile symbol decode (parallelizable), then the batched
    whole-frame reconstruction.

Packet layout:  u8 ntiles | u32 len[ntiles-1] (little-endian) | streams
(the last tile's length is implied by the packet size).  Tile 0 opens
with the frame header (quantizers, PVQ QM); other tiles start directly
at their first superblock.
"""

from __future__ import annotations

import multiprocessing as _mp
import struct

__all__ = ["tile_rows", "pack_tiles", "unpack_tiles", "run_tiles"]


def tile_rows(nvsb: int, tiles: int):
    """Partition nvsb superblock rows into <= tiles contiguous groups,
    as evenly as possible.  Returns [(row0, row1), ...]."""
    t = max(1, min(int(tiles), nvsb))
    bounds = [round(i * nvsb / t) for i in range(t + 1)]
    return [(bounds[i], bounds[i + 1]) for i in range(t)
            if bounds[i + 1] > bounds[i]]


def pack_tiles(streams) -> bytes:
    assert 1 <= len(streams) < 256
    head = struct.pack("<B", len(streams))
    head += b"".join(struct.pack("<I", len(s)) for s in streams[:-1])
    return head + b"".join(streams)


_STASH = {}


def _tile_call(i):
    return _STASH["fn"](i)


def run_tiles(fn, n: int, processes: int = 1):
    """Run fn(i) for i in range(n), forked across processes when
    processes > 1.  fn may be a closure over the frame's plane arrays —
    it reaches the children through fork copy-on-write, not a pickle;
    only the RESULTS (range-coder state, adaptation state, mutated
    plane rows) are pickled back.  The caller merges them, which keeps
    serial and parallel execution bit-identical."""
    if processes <= 1 or n <= 1:
        return [fn(i) for i in range(n)]
    _STASH["fn"] = fn
    try:
        ctx = _mp.get_context("fork")
        with ctx.Pool(min(processes, n)) as pool:
            return pool.map(_tile_call, range(n))
    finally:
        _STASH.pop("fn", None)


def unpack_tiles(packet: bytes):
    """Split a frame packet into tile streams.  Corrupt or truncated
    input degrades to empty streams (the range decoder then returns
    zeros) rather than raising — decoder robustness contract."""
    if len(packet) == 0:
        return [b""]
    ntiles = max(1, packet[0])
    off = 1 + 4 * (ntiles - 1)
    if off > len(packet):
        return [b""]
    lens = [struct.unpack_from("<I", packet, 1 + 4 * i)[0]
            for i in range(ntiles - 1)]
    out = []
    for ln in lens:
        out.append(packet[off:off + ln])
        off += ln
    out.append(packet[off:] if off <= len(packet) else b"")
    return out
