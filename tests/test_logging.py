"""Leveled logging facility (src/logging.{c,h} parity: OD_LOG_MODULES
env config semantics under DTPU_LOG_MODULES)."""

import numpy as np

from daala_tpu.core import logging as dlog


def test_env_spec_parse_and_gating(capsys):
    dlog.reload_config("encoder:4,motion:6,bad,worse:x")
    assert dlog.logging_active("encoder", dlog.OD_LOG_INFO)
    assert not dlog.logging_active("encoder", dlog.OD_LOG_DEBUG)
    assert dlog.logging_active("motion", 6)
    assert not dlog.logging_active("pvq", dlog.OD_LOG_ERR)
    assert dlog.od_log("encoder", dlog.OD_LOG_INFO, "q=%d", 25)
    assert not dlog.od_log("pvq", dlog.OD_LOG_ERR, "never")
    # Lazy formatting: the callable must not run when disabled.
    ran = []
    assert not dlog.od_log("pvq", 1, lambda: ran.append(1) or "x")
    assert not ran
    err = capsys.readouterr().err
    assert "[encoder/INFO] q=25" in err
    dlog.reload_config("")
    assert not dlog.logging_active("encoder", 1)


def test_log_matrix(capsys):
    dlog.reload_config("dct:5")
    assert dlog.log_matrix("dct", 5, "m", np.arange(6).reshape(2, 3))
    err = capsys.readouterr().err
    assert "m (2x3" in err and "3 4 5" in err
    dlog.reload_config("")
