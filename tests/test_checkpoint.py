"""Mid-fit checkpoint/resume (SURVEY.md §5 checkpoint subsystem).

The reference's only checkpoint is the saved model object; we add resumable
mid-fit state with an *exact replay* contract: a fit killed at any point and
resumed from its checkpoint produces bit-identical results to an
uninterrupted run (each AI-REML outer iteration is Markov in (tau, alpha,
eta) because the Hutchinson trace restarts its R-RNG stream per call, and
the variance-ratio pass replays a fixed marker order).
"""

import os

import numpy as np
import pandas as pd
import pytest

import saigegds_tpu.models.fitnull as fitnull
from saigegds_tpu.config import NullModelConfig

PHENO = "/root/reference/inst/extdata/pheno.txt.gz"
GDS = "/root/reference/inst/extdata/grm1k_10k_snp.gds"


class _Boom(RuntimeError):
    pass


def _fit(cfg):
    pheno = pd.read_csv(PHENO, sep="\t")
    return fitnull.fit_null_glmm("y ~ x1 + x2", pheno, GDS, cfg)


@pytest.fixture(scope="module")
def base_model():
    return _fit(NullModelConfig(trait_type="binary"))


def _assert_same(m1, m2):
    np.testing.assert_array_equal(m1.tau, m2.tau)
    np.testing.assert_array_equal(m1.coefficients, m2.coefficients)
    np.testing.assert_array_equal(m1.fitted_values, m2.fitted_values)
    np.testing.assert_array_equal(m1.var_ratio["ratio"],
                                  m2.var_ratio["ratio"])
    np.testing.assert_array_equal(m1.var_ratio["id"], m2.var_ratio["id"])


def test_resume_after_midfit_crash(tmp_path, monkeypatch, base_model):
    """Kill the fit inside outer iteration 2; resume is bit-identical."""
    ck = str(tmp_path / "fit_ck")
    cfg = NullModelConfig(trait_type="binary", checkpoint=ck)

    real = fitnull._fit_tau_binary
    calls = {"n": 0}

    def bomb(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise _Boom()
        return real(*a, **k)

    monkeypatch.setattr(fitnull, "_fit_tau_binary", bomb)
    with pytest.raises(_Boom):
        _fit(cfg)
    assert os.path.exists(ck + ".fit.npz")      # iteration-1 state saved
    monkeypatch.setattr(fitnull, "_fit_tau_binary", real)

    resumed = _fit(cfg)
    _assert_same(resumed, base_model)
    # resume state is dropped once fit + var-ratio complete
    assert not os.path.exists(ck + ".fit.npz")
    assert not os.path.exists(ck + ".vr.npz")


def test_resume_after_var_ratio_crash(tmp_path, monkeypatch, base_model):
    """Kill after the first variance-ratio chunk; the resumed run skips the
    whole AI-REML fit (done-state) and continues the marker scan."""
    ck = str(tmp_path / "vr_ck")
    cfg = NullModelConfig(trait_type="binary", checkpoint=ck)

    real = fitnull._ck_save

    def bomb(path, **arrs):
        real(path, **arrs)
        if path.endswith(".vr.npz"):
            raise _Boom()

    monkeypatch.setattr(fitnull, "_ck_save", bomb)
    with pytest.raises(_Boom):
        _fit(cfg)
    assert os.path.exists(ck + ".fit.npz")
    assert os.path.exists(ck + ".vr.npz")
    monkeypatch.setattr(fitnull, "_ck_save", real)

    # the fit phase must not rerun: poison the tau update to prove the
    # done-state short-circuit is taken
    def poison(*a, **k):
        raise AssertionError("fit phase reran despite done checkpoint")

    monkeypatch.setattr(fitnull, "_fit_tau_binary", poison)
    resumed = _fit(cfg)
    _assert_same(resumed, base_model)
    assert not os.path.exists(ck + ".fit.npz")


def test_stale_checkpoint_ignored(tmp_path, base_model):
    """A checkpoint from a different model shape is ignored with a warning,
    not silently resumed."""
    ck = str(tmp_path / "stale_ck")
    fitnull._ck_save(ck + ".fit.npz", phase="iter", it=3, brk=False,
                     n=17, k=2, binary=True, tau=np.array([1.0, 0.5]),
                     alpha=np.zeros(2), eta=np.zeros(17),
                     alpha0=np.zeros(2), eta0=np.zeros(17))
    cfg = NullModelConfig(trait_type="binary", checkpoint=ck)
    with pytest.warns(UserWarning, match="shape mismatch"):
        m = _fit(cfg)
    _assert_same(m, base_model)
