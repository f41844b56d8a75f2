"""GOP-parallel encoding: shard independent keyframe-delimited GOPs
across worker processes.

Keyframes fully reset entropy adaptation (od_adapt_ctx_reset,
state.c:595) and references, so GOPs are coding-independent: encoding
them in parallel and concatenating packets in order is bit-identical to
the serial encode (tested).  This is the host-level data-parallel axis
of SURVEY.md section 2.11 — the same sharding the device path applies
over the `gop` mesh axis, and what a multi-host deployment runs over
DCN with one GOP range per host.
"""

from __future__ import annotations

import multiprocessing as mp
import os
from typing import List

from ..core.state import FrameInfo
from ..io.container import FramePacket

__all__ = ["encode_gops_parallel", "split_gops"]


def split_gops(nframes: int, gop_len: int):
    """[(start, end), ...] GOP frame ranges."""
    return [(s, min(s + gop_len, nframes))
            for s in range(0, nframes, gop_len)]


def _p_anchors(nframes_after_key: int, b_frames: int) -> int:
    """P anchors a GOP contributes to the golden cadence counter: one
    per full (b+1) group plus the trailing flush frames (coded as P)."""
    if b_frames <= 0:
        return nframes_after_key
    return (nframes_after_key // (b_frames + 1)
            + nframes_after_key % (b_frames + 1))


def _encode_gop(args):
    (frames, info_dict, quality, kwargs, base_index, golden_phase) = args
    from ..pipeline.inter import EncoderSession

    info = FrameInfo(**info_dict)
    sess = EncoderSession(info, quality, keyframe_rate=1 << 30, **kwargs)
    # Seed the golden cadence with the global I/P-frame phase so the
    # parallel streams are bit-identical to the serial encode (the
    # reference's cadence is a GLOBAL ip_frame_count modulo,
    # encode.c:2958, not per-GOP).
    sess.since_golden = golden_phase
    outs = []
    for fr in frames:
        outs += sess.push_frame(fr)
    outs += sess.flush()
    pkts = []
    for o in outs:
        pkts.append(dict(
            data=o["data"], ftype=o["ftype"],
            display_order=base_index + o["display_order"],
            use_haar=o.get("use_haar", False)))
    return pkts


def encode_gops_parallel(frames: List, info: FrameInfo, quality: int,
                         gop_len: int = 8, workers: int = None,
                         **session_kwargs) -> List[FramePacket]:
    """Encode `frames` as keyframe-delimited GOPs across processes.

    Returns packets in coding order (GOPs in order; within a GOP,
    anchors before their B-frames)."""
    info_dict = dict(
        pic_width=info.pic_width, pic_height=info.pic_height,
        nplanes=info.nplanes, xdec=info.xdec, ydec=info.ydec,
        bitdepth=info.bitdepth, keyframe_rate=info.keyframe_rate,
        timebase_num=info.timebase_num, timebase_den=info.timebase_den,
        qm=getattr(info, "qm", 1),
    )
    from ..pipeline.inter import GOLDEN_INTERVAL

    cfg = session_kwargs.get("config")
    b = (cfg.b_frames if cfg is not None
         else session_kwargs.get("b_frames", 0))
    jobs = []
    phase = 0
    for (s, e) in split_gops(len(frames), gop_len):
        jobs.append((frames[s:e], info_dict, quality, session_kwargs, s,
                     phase))
        phase = (phase + _p_anchors(e - s - 1, b)) % GOLDEN_INTERVAL
    del b
    if workers is None:
        workers = min(len(jobs), os.cpu_count() or 1)
    if workers <= 1:
        results = [_encode_gop(j) for j in jobs]
    else:
        ctx = mp.get_context("fork")
        with ctx.Pool(workers) as pool:
            results = pool.map(_encode_gop, jobs)
    bs_luma = (cfg.bs_luma if cfg is not None
               else session_kwargs.get("bs_luma", 1))
    packets = []
    for gop_pkts in results:
        for p in gop_pkts:
            packets.append(FramePacket(
                data=p["data"], keyframe=p["ftype"] == 0,
                use_haar=p["use_haar"],
                bs_luma=3 if p["use_haar"] else max(bs_luma, 0),
                ftype=p["ftype"], display_order=p["display_order"]))
    return packets
