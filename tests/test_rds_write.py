"""RDS writer: round-trip the null-model checkpoint contract.

The reference's checkpoint format is .rds (R/saige_main.r:630-643); our
writer must produce files our reader (and R) can load with identical
numerics.
"""

import numpy as np
import pytest

from saigegds_tpu.io.rds import read_rds, strip
from saigegds_tpu.io.rds_write import rds_bytes, write_rds
from saigegds_tpu.models.nullmodel import NullModel

REF = "/root/reference/inst/unitTests/saige_model.rds"


def test_primitive_roundtrip(tmp_path):
    from saigegds_tpu.io.rds import parse_rds_bytes, RObject

    obj = {
        "x": np.arange(5, dtype=np.int32),
        "y": np.linspace(0, 1, 4),
        "s": np.asarray(["a", "bc", None], object),
        "flag": True,
        "mat": RObject(np.arange(6, dtype=np.float64).reshape(2, 3), {}),
        "nested": {"u": np.asarray([1.5])},
        "null": None,
    }
    back = parse_rds_bytes(rds_bytes(obj))
    assert back.names == list(obj.keys())
    np.testing.assert_array_equal(strip(back["x"]), obj["x"])
    np.testing.assert_array_equal(strip(back["y"]), obj["y"])
    got_s = strip(back["s"])
    assert list(got_s[:2]) == ["a", "bc"] and got_s[2] is None
    assert strip(back["flag"])[0] == 1
    m = back["mat"]
    np.testing.assert_array_equal(
        np.asarray(strip(m)).reshape(2, 3, order="F"), strip(obj["mat"]))
    np.testing.assert_array_equal(strip(back["nested"]["u"]), [1.5])
    assert back["null"] is None


def test_model_rds_roundtrip(tmp_path):
    """reference model -> our writer -> our reader == original."""
    ref = NullModel.load(REF)
    fn = str(tmp_path / "model.rds")
    ref.save(fn)
    back = NullModel.load(fn)
    assert back.trait_type == ref.trait_type
    assert back.converged == ref.converged
    assert back.coef_names == ref.coef_names
    for f in ("coefficients", "tau", "linear_predictors", "fitted_values",
              "residuals", "cov", "y", "mu", "res", "V", "X1", "XV",
              "XXVX_inv"):
        np.testing.assert_array_equal(np.asarray(getattr(back, f)),
                                      np.asarray(getattr(ref, f)), err_msg=f)
    for k in ref.var_ratio:
        np.testing.assert_array_equal(np.asarray(back.var_ratio[k]),
                                      np.asarray(ref.var_ratio[k]),
                                      err_msg=k)
    np.testing.assert_array_equal(back.sample_id, ref.sample_id)
    np.testing.assert_array_equal(back.variant_id, ref.variant_id)


def test_rds_model_scans_identically(tmp_path):
    """A model saved as .rds drives the scan exactly like the original."""
    import saigegds_tpu as st
    from saigegds_tpu.config import ScanConfig

    fn = str(tmp_path / "m.rds")
    NullModel.load(REF).save(fn)
    cfg = ScanConfig(mac=4)
    gds = "/root/reference/inst/extdata/grm1k_10k_snp.gds"
    a = st.assoc_spa(gds, REF, cfg)
    b = st.assoc_spa(gds, fn, cfg)
    np.testing.assert_array_equal(a["pval"].to_numpy(), b["pval"].to_numpy())


def test_class_attr_preserved(tmp_path):
    fn = str(tmp_path / "m2.rds")
    NullModel.load(REF).save(fn)
    raw = read_rds(fn)
    assert strip(raw.attributes["class"])[0] == "ClassSAIGE_NullModel"
    assert strip(raw["var.ratio"].attributes["class"])[0] == "data.frame"


def test_rdata_model_roundtrip(tmp_path):
    """.rda save/load (the reference's save(glmm, file=) container)."""
    import numpy as np
    from saigegds_tpu.io.rds import read_rdata
    from saigegds_tpu.models.nullmodel import NullModel

    g = NullModel.load("/root/reference/inst/unitTests/saige_model.rds")
    fn = str(tmp_path / "model.rda")
    g.save(fn)
    assert list(read_rdata(fn).keys()) == ["glmm"]
    m = NullModel.load(fn)
    np.testing.assert_allclose(m.tau, g.tau, rtol=0)
    np.testing.assert_allclose(m.coefficients, g.coefficients, rtol=0)
    np.testing.assert_array_equal(m.y, g.y)
