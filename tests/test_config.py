"""Config/flag system consumers (SURVEY.md section 5.6): the TPUKZG_* env
knobs must reach real code paths, not just dataclasses."""

import numpy as np
import pytest


def test_msm_window_env_reaches_engine(rng, monkeypatch):
    from tpukzg.utils.config import MsmConfig
    from tpukzg.msm.pippenger_lm import PippengerLM

    monkeypatch.setenv("TPUKZG_MSM_WINDOW", "5")
    monkeypatch.setenv("TPUKZG_MSM_WINDOW_CHUNK", "2")
    cfg = MsmConfig.from_env()
    assert cfg.window == 5 and cfg.window_chunk == 2
    pip = PippengerLM()
    assert pip.window == 5 and pip.window_chunk == 2
    # explicit args still beat env
    assert PippengerLM(window=7).window == 7

    # the env window changes the compiled program (c=5) but not results
    from tpukzg.curve import g1 as g1m
    import golden.model as gold
    ks = [rng.randrange(1 << 32) for _ in range(4)]
    affs = [gold.g1_affine(gold.g1_mul(gold.G1_GEN, k + 1)) for k in range(4)]
    pts = g1m.points_from_ints([a[0] for a in affs], [a[1] for a in affs],
                               [False] * 4)
    scal = np.asarray(g1m.FR.from_int(ks))
    out = pip.msm(tuple(np.asarray(c) for c in pts), scal)
    want = None
    for k, a in zip(ks, affs):
        t = gold.g1_mul(gold.g1_from_affine(a), k)
        want = t if want is None else gold.g1_add(want, t)
    x, y, inf = g1m.point_to_ints(out)
    assert not inf and (x, y) == gold.g1_affine(want)


def test_scan_impl_env(monkeypatch):
    from tpukzg.utils.config import ScanConfig

    monkeypatch.setenv("TPUKZG_SCAN_IMPL", "assoc")
    assert ScanConfig.from_env().impl == "assoc"
    monkeypatch.setenv("TPUKZG_SCAN_IMPL", "bogus")
    with pytest.raises(AssertionError):
        ScanConfig.from_env()


def test_ntt_rows_env(monkeypatch):
    from tpukzg.utils.config import NttConfig

    monkeypatch.setenv("TPUKZG_NTT_ROWS", "4")
    assert NttConfig.from_env().four_step_rows == 4


def test_config_json_embedding():
    from tpukzg.utils.config import (FieldConfig, MsmConfig, ScanConfig,
                                     as_json_dict)
    d = as_json_dict(FieldConfig(), MsmConfig(), ScanConfig())
    assert d["FieldConfig"]["fp_limbs"] == 24
    assert "impl" in d["ScanConfig"]


def test_field_config_carry_env(monkeypatch):
    """FieldConfig carry lowering selectors (consumed by FieldParams /
    FieldLM construction — VERDICT r3 item 10: real consumers)."""
    from tpukzg.utils.config import FieldConfig

    # unset -> "auto": ks for Fp iff on TPU, resolved lazily at first
    # trace (round-5 earned default; field/mont.py carry_impl property)
    assert FieldConfig.from_env().carry_fp == "auto"
    from tpukzg.field.mont import FP
    assert FP.carry_impl == "scan"   # this suite is pinned to CPU
    monkeypatch.setenv("TPUKZG_CARRY_FP", "ks")
    monkeypatch.setenv("TPUKZG_CARRY_LM", "ks")
    cfg = FieldConfig.from_env()
    assert cfg.carry_fp == "ks" and cfg.carry_lm == "ks"
    monkeypatch.setenv("TPUKZG_CARRY_FR", "bogus")
    with pytest.raises(AssertionError):
        FieldConfig.from_env()


def test_kzg_config_check_subgroup_consumer(monkeypatch):
    """TPUKZG_CHECK_SUBGROUP=0 (KzgConfig) skips the GLV membership
    chain in g1.decompress_batch; valid points still decompress and
    malformed encodings still reject."""
    import numpy as np
    from tpukzg.curve import g1 as g1m

    monkeypatch.setenv("TPUKZG_CHECK_SUBGROUP", "0")
    gen = g1m.compress_point(tuple(np.asarray(c) for c in g1m.G1.gen_np))
    pts, ok = g1m.decompress_batch([gen])
    assert bool(np.all(np.asarray(ok)))
    with pytest.raises(ValueError):
        g1m.decompress_batch([b"\x00" * 48])   # missing compressed flag
