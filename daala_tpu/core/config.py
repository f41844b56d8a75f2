"""Unified typed encoder configuration (SURVEY.md section 5 config
tier 2+3): ONE object that carries every runtime knob the reference
exposes through ``daala_encode_ctl`` (daalaenc.h:157-215) plus the
TPU build's own session knobs, with the scattered ``DTPU_*``
environment variables folded in as explicit overrides.

The reference splits configuration across compile-time autoconf flags,
the ctl() call surface and ad-hoc env vars; here tiers (2) and (3)
collapse into :class:`EncoderConfig` — CLI flags construct one, env
vars override individual fields through :meth:`EncoderConfig.from_env`,
and ``EncoderSession(info, config=cfg)`` consumes it.  The ctl-code
names from the reference map 1:1 through :meth:`EncoderConfig.ctl` so a
user of the reference API finds every knob under its old name.

Complexity ladder: the reference maps complexity 0-10 to search
patterns and RDO stages (encint.h:51-59, mcenc.c:6517-6545).  The TPU
build's equivalent trade-offs live in :func:`complexity_params`.
"""

from __future__ import annotations

import dataclasses
import os

__all__ = ["EncoderConfig", "DecoderConfig", "complexity_params",
           "CTL_NAMES"]


@dataclasses.dataclass
class EncoderConfig:
    """Every encoder-side runtime knob, with reference-ctl parity.

    Fields marked [ctl] correspond to a ``daala_encode_ctl`` code in
    include/daala/daalaenc.h:157-215; the rest are TPU-session knobs
    (tiles, device pipeline, rate control) with no reference
    counterpart.
    """

    # -- rate/quality ----------------------------------------------------
    quality: int = 25          # [ctl OD_SET_QUANT] coded quantizer 0..63
    bitrate: int = 0           # -V kbit/s leaky bucket (0 = CQ)
    keyframe_rate: int = 256   # -k
    b_frames: int = 0          # [ctl OD_SET_B_FRAMES] 0..4

    # -- search / RDO effort ---------------------------------------------
    complexity: int = 7        # [ctl OD_SET_COMPLEXITY] 0..10
    mc_use_satd: int = -1      # [ctl OD_SET_MC_SATD] -1 = by complexity
    mc_use_chroma: bool = True  # [ctl OD_SET_MC_USE_CHROMA]
    mv_res_min: int = 0        # [ctl OD_SET_MV_RES_MIN] 0=1/8 1=1/4 2=1/2
    mv_level_min: int = 0      # [ctl OD_SET_MV_LEVEL_MIN] 0..4
    mv_level_max: int = 3      # [ctl OD_SET_MV_LEVEL_MAX] 0..4

    # -- tools / perceptual ----------------------------------------------
    use_masking: bool = False  # [ctl OD_SET_ACTIVITY_MASKING]
    qm: int = 1                # [ctl OD_SET_QM] 0 = flat, 1 = HVS
    use_dering: bool = True    # [ctl OD_SET_DERING]
    bs_luma: int = -1          # -1 = auto splitter, 0..3 fixed size

    # -- TPU session knobs -----------------------------------------------
    tiles: int = 1             # per-frame entropy tiles (SB-row groups)
    tile_workers: int = 1      # forked/threaded tile coders
    dres: bool = False         # device-residual stream mode
    device: bool = False       # full device-side encode pipeline
    chunk: int = 8             # --device frames per dispatch
    gray_gop: bool = False     # --device gray-reference GOP openers

    def __post_init__(self):
        self.validate()

    def validate(self):
        if not 0 <= self.quality <= 63:
            raise ValueError("quality must be 0..63")
        if not 0 <= self.complexity <= 10:
            raise ValueError("complexity must be 0..10")
        if not 0 <= self.b_frames <= 4:
            raise ValueError("b_frames must be 0..4")
        if self.qm not in (0, 1):
            raise ValueError("qm must be 0 (flat) or 1 (HVS)")
        if not 0 <= self.mv_res_min <= 2:
            raise ValueError("mv_res_min must be 0..2")
        # Reference contract (daalaenc.h:199-215): levels 0..4 are
        # accepted and MV_LEVEL_MIN > MAX resolves to MAX at use time
        # (encode.c:560-583) — the STORED ctl values stay as requested
        # so a read-back returns what was set and later raising MAX
        # restores a higher MIN.  effective_mv_levels() applies the
        # internal mapping (the TPU mesh has 4 internal levels, so
        # reference level 4 maps onto the finest internal level 3).
        if not (0 <= self.mv_level_min <= 4
                and 0 <= self.mv_level_max <= 4):
            raise ValueError("mv_level_min/max must be 0..4")
        if not -1 <= self.bs_luma <= 3:
            raise ValueError("bs_luma must be -1 (auto) or 0..3")
        if self.mc_use_satd not in (-1, 0, 1):
            raise ValueError("mc_use_satd must be -1/0/1")
        return self

    # -- ctl-name surface ------------------------------------------------

    def ctl(self, name: str, value):
        """Set a knob by its reference ctl name (daalaenc.h:157-215)
        or by field name; returns self for chaining."""
        field = CTL_NAMES.get(name, name)
        if field not in {f.name for f in dataclasses.fields(self)}:
            raise ValueError(f"unknown ctl {name!r}")
        setattr(self, field, type(getattr(self, field))(value)
                if not isinstance(value, bool) else value)
        return self.validate()

    # -- env overrides ---------------------------------------------------

    @classmethod
    def from_env(cls, **kw) -> "EncoderConfig":
        """Build a config from kwargs, then apply any DTPU_<FIELD>
        environment overrides (e.g. DTPU_COMPLEXITY=9,
        DTPU_USE_DERING=0).  The legacy tuning env vars
        (DTPU_REFINE_ITERS etc.) are consumed deeper in the stack and
        keep working as expert overrides."""
        cfg = cls(**kw)
        for f in dataclasses.fields(cls):
            v = os.environ.get("DTPU_" + f.name.upper())
            if v is None:
                continue
            if f.type in ("bool", bool):
                setattr(cfg, f.name, v not in ("0", "", "false"))
            else:
                setattr(cfg, f.name, int(v))
        return cfg.validate()

    def effective_mv_levels(self):
        """Resolved (min, max) internal-ladder mesh levels: ctl level 4
        clamps to the finest internal level 3, and min > max resolves
        to max — the use-time semantics of encode.c:560-583, applied
        without rewriting the stored ctl values."""
        mx = min(self.mv_level_max, 3)
        mn = min(self.mv_level_min, 3, mx)
        return mn, mx

    # -- derived ---------------------------------------------------------

    def search_params(self) -> dict:
        """Resolved motion-search effort for this config (complexity
        ladder + explicit SATD override)."""
        p = complexity_params(self.complexity)
        if self.mc_use_satd >= 0:
            p["use_satd"] = bool(self.mc_use_satd)
        return p


#: reference ctl code name -> EncoderConfig field
CTL_NAMES = {
    "OD_SET_QUANT": "quality",
    "OD_SET_COMPLEXITY": "complexity",
    "OD_SET_MC_USE_SATD": "mc_use_satd",
    "OD_SET_MC_SATD": "mc_use_satd",
    "OD_SET_ACTIVITY_MASKING": "use_masking",
    "OD_SET_QM": "qm",
    "OD_SET_DERING": "use_dering",
    "OD_SET_MC_CHROMA": "mc_use_chroma",       # daalaenc.h:192
    "OD_SET_MC_USE_CHROMA": "mc_use_chroma",   # legacy alias
    "OD_SET_MV_RES_MIN": "mv_res_min",
    "OD_SET_MV_LEVEL_MIN": "mv_level_min",
    "OD_SET_MV_LEVEL_MAX": "mv_level_max",
    "OD_SET_B_FRAMES": "b_frames",
}


def complexity_params(c: int) -> dict:
    """Map complexity 0..10 to concrete search/RDO effort — the TPU
    analogue of the reference's pattern-by-complexity tables
    (encint.h:51-59: square vs diamond DP patterns, logarithmic passes
    at >=9; SATD subpel stage switch mcenc.c:6527-6545).

    refine_iters: Gauss-Seidel sweeps of the blend-aware lattice
    refinement (search/me.py refine_mesh_lattice — our stand-in for the
    DP refinement).  use_satd: score the final subpel stage and ref
    selection with Hadamard SATD instead of SAD (ops/satd.py).
    rdo_bsize: open-loop splitter below 2, RDO splitter at >=2
    (block_size_enc.c gate).  dense_me: full hierarchical dense mesh
    search vs coarse-only.
    """
    c = max(0, min(10, int(c)))
    return {
        "refine_iters": 0 if c < 2 else (1 if c < 9 else 3),
        "use_satd": c >= 8,
        "rdo_bsize": c >= 2,
        "dense_me": c >= 1,
    }


@dataclasses.dataclass
class DecoderConfig:
    """Decoder-side knobs (daaladec.h:38-48 introspection ctls)."""

    introspect: bool = False   # export bsize/MV/dering/accounting
    accounting: bool = False   # per-symbol bit accounting records

    @classmethod
    def from_env(cls, **kw) -> "DecoderConfig":
        cfg = cls(**kw)
        for f in dataclasses.fields(cls):
            v = os.environ.get("DTPU_" + f.name.upper())
            if v is not None:
                setattr(cfg, f.name, v not in ("0", "", "false"))
        return cfg
