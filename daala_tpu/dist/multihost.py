"""Multi-host (multi-process) GOP-sharded encode over jax.distributed.

The DCN-axis code path SURVEY.md §2.11 calls for: separate OS
processes (the dryrun stand-in for separate hosts), each with its own
JAX runtime, joined through `jax.distributed.initialize`.  Every
process encodes its own keyframe-delimited GOP ranges — GOPs are
coding-independent (od_adapt_ctx_reset, state.c:595), exactly the
property the in-process `dist/gop.py` proxy exploits — and the packed
streams are exchanged through a real cross-process collective
(`multihost_utils.process_allgather`, the jax analogue of the DCN
gather), so the concatenated stream on process 0 is byte-identical to
the serial single-process encode (tests/test_multihost.py).

Worker entry:
    python -m daala_tpu.dist.multihost --coordinator 127.0.0.1:PORT \
        --num-processes 2 --process-id K --out /tmp/stream.bin ...
Launcher:
    dryrun_multihost(nproc=2) spawns the workers, waits, and verifies
    byte-identity against the serial encode.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

__all__ = ["dryrun_multihost", "test_clip", "encode_serial"]


def test_clip(nframes=12, h=96, w=128, seed=9):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 64, w + 64), dtype=np.uint8)
    yy, xx = np.mgrid[0:h + 64, 0:w + 64]
    base = ((base // 4) + (yy + 2 * xx) % 170).astype(np.uint8)
    frames = []
    for i in range(nframes):
        y = base[2 * i:2 * i + h, 3 * i:3 * i + w]
        u = y[::2, ::2] // 2 + 60
        v = 220 - u
        frames.append([y, u, v])
    return frames


def _info(h, w, kf):
    from ..core.state import FrameInfo

    return FrameInfo(pic_width=w, pic_height=h, nplanes=3,
                     xdec=(0, 1, 1), ydec=(0, 1, 1), bitdepth=8,
                     keyframe_rate=kf)


def _encode_range(frames, h, w, kf, quality):
    """Encode whole GOPs serially (EncoderSession, one keyframe per
    GOP) and return the packet blobs in coding order."""
    from ..pipeline.inter import EncoderSession

    sess = EncoderSession(_info(h, w, kf), quality)
    outs = []
    for fr in frames:
        outs += sess.push_frame(fr)
    outs += sess.flush()
    return [o["data"] for o in outs]


def encode_serial(frames, h, w, kf, quality):
    return b"".join(
        len(p).to_bytes(4, "little") + p
        for p in _encode_range(frames, h, w, kf, quality))


def _worker_main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--gop", type=int, default=4)
    ap.add_argument("--quality", type=int, default=30)
    args = ap.parse_args(argv)

    import jax

    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id)
    from jax.experimental import multihost_utils

    nproc = args.num_processes
    pid = args.process_id
    frames = test_clip(args.frames)
    h, w = frames[0][0].shape
    from .gop import split_gops

    gops = split_gops(len(frames), args.gop)
    # Round-robin GOP ownership across hosts (static schedule — the
    # deployment analogue is one GOP range per host over DCN).
    blobs = {}
    for gi, (s, e) in enumerate(gops):
        if gi % nproc != pid:
            continue
        pkts = _encode_range(frames[s:e], h, w, args.gop,
                             args.quality)
        blobs[gi] = b"".join(
            len(p).to_bytes(4, "little") + p for p in pkts)

    # Cross-process gather of the packed GOP streams: fixed-size
    # uint8 tensors (len-prefixed, zero-padded) through the real
    # collective path.
    mylen = max((len(b) for b in blobs.values()), default=0)
    maxlen = int(multihost_utils.process_allgather(
        np.asarray([mylen], dtype=np.int32)).max())
    per = []
    for gi, (s, e) in enumerate(gops):
        if gi % nproc == pid:
            b = blobs[gi]
            buf = np.zeros(maxlen + 4, dtype=np.uint8)
            buf[:4] = np.frombuffer(
                len(b).to_bytes(4, "little"), dtype=np.uint8)
            buf[4:4 + len(b)] = np.frombuffer(b, dtype=np.uint8)
        else:
            buf = np.zeros(maxlen + 4, dtype=np.uint8)
        per.append(buf)
    stacked = np.stack(per)                      # (ngops, maxlen+4)
    gathered = multihost_utils.process_allgather(stacked)
    # gathered: (nproc, ngops, maxlen+4); owner rows are nonzero.
    if pid == 0:
        out = b""
        for gi in range(len(gops)):
            row = gathered[gi % nproc, gi]
            n = int.from_bytes(row[:4].tobytes(), "little")
            out += row[4:4 + n].tobytes()
        with open(args.out, "wb") as f:
            f.write(out)
    multihost_utils.sync_global_devices("dtpu_multihost_done")


def dryrun_multihost(nproc=2, nframes=12, gop=4, quality=30,
                     timeout=900):
    """Spawn nproc OS processes joined via jax.distributed, encode a
    GOP-sharded clip, and assert the gathered stream is byte-identical
    to the serial single-process encode.  Returns the stream bytes."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = "127.0.0.1:%d" % port
    out = tempfile.mktemp(suffix=".dtpms")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = []
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "daala_tpu.dist.multihost",
             "--coordinator", coord, "--num-processes", str(nproc),
             "--process-id", str(pid), "--out", out,
             "--frames", str(nframes), "--gop", str(gop),
             "--quality", str(quality)],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))))
    for p in procs:
        rc = p.wait(timeout=timeout)
        if rc:
            raise RuntimeError("multihost worker failed rc=%d" % rc)
    with open(out, "rb") as f:
        got = f.read()
    os.unlink(out)
    frames = test_clip(nframes)
    h, w = frames[0][0].shape
    want = encode_serial(frames, h, w, gop, quality)
    if got != want:
        raise AssertionError(
            "multihost stream differs from serial (%d vs %d bytes)"
            % (len(got), len(want)))
    return got


if __name__ == "__main__":
    _worker_main()
