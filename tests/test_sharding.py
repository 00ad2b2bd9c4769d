"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saigegds_tpu.ops.grm import build_grm, grm_matvec
from saigegds_tpu.ops.pcg import pcg_solve
from saigegds_tpu.parallel.mesh import (make_mesh, replicate,
                                        shard_grm, shard_variant_batch,
                                        shard_vectors)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


@pytest.fixture(scope="module")
def small_grm():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 3, size=(256, 64)).astype(np.int8)
    codes[rng.random(codes.shape) < 0.01] = 3
    return build_grm(codes)


def test_sharded_matvec_matches(mesh, small_grm):
    b = np.random.default_rng(1).normal(size=64)
    want = np.asarray(small_grm.matvec(jnp.asarray(b)))
    sg = shard_grm(small_grm, mesh)
    bv = shard_vectors(mesh, b)
    got = np.asarray(grm_matvec(sg.std_geno, bv))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_sharded_pcg_matches(mesh, small_grm):
    rng = np.random.default_rng(2)
    w = rng.uniform(0.1, 0.3, size=64)
    tau = np.array([1.0, 0.5])
    B = rng.normal(size=(64, 3))
    want, it_w, conv_w = pcg_solve(small_grm.std_geno, small_grm.diag,
                                   jnp.asarray(w), jnp.asarray(tau),
                                   jnp.asarray(B), 1e-5, 500)
    sg = shard_grm(small_grm, mesh)
    got, it_g, conv_g = pcg_solve(sg.std_geno, sg.diag,
                                  shard_vectors(mesh, w), jnp.asarray(tau),
                                  shard_vectors(mesh, B), 1e-5, 500)
    assert bool(conv_w.all()) and bool(conv_g.all())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)


@pytest.mark.parametrize("n_dev,impl", [(8, "packed"), (3, "dense")])
def test_sharded_fit_golden(n_dev, impl):
    """Full null fit over a device mesh reproduces the reference fixture.

    n_dev=3 exercises the sample-padding path (1000 % 3 != 0)."""
    import pandas as pd
    from saigegds_tpu.config import NullModelConfig
    from saigegds_tpu.models.fitnull import fit_null_glmm
    from saigegds_tpu.models.nullmodel import NullModel

    pheno = pd.read_csv("/root/reference/inst/extdata/pheno.txt.gz", sep="\t")
    m = fit_null_glmm("y ~ x1 + x2", pheno,
                      "/root/reference/inst/extdata/grm1k_10k_snp.gds",
                      NullModelConfig(trait_type="binary", grm_impl=impl),
                      mesh=make_mesh(n_dev))
    ref = NullModel.load("/root/reference/inst/unitTests/saige_model.rds")
    np.testing.assert_allclose(m.tau, ref.tau, atol=1e-8)
    np.testing.assert_allclose(m.coefficients, ref.coefficients, rtol=1e-8,
                               atol=1e-8)
    np.testing.assert_allclose(m.fitted_values, ref.fitted_values, atol=1e-7)
    np.testing.assert_allclose(m.var_ratio["ratio"], ref.var_ratio["ratio"],
                               rtol=1e-10)


def test_mesh_parallel_scan_matches(mesh):
    """assoc_spa(mesh=...) == single-device scan."""
    import saigegds_tpu as st
    from saigegds_tpu.config import ScanConfig

    want = st.assoc_spa("/root/reference/inst/extdata/grm1k_10k_snp.gds",
                        "/root/reference/inst/unitTests/saige_model.rds",
                        ScanConfig(mac=4, block_size=256))
    got = st.assoc_spa("/root/reference/inst/extdata/grm1k_10k_snp.gds",
                       "/root/reference/inst/unitTests/saige_model.rds",
                       ScanConfig(mac=4, block_size=256), mesh=mesh)
    np.testing.assert_array_equal(got["id"].to_numpy(), want["id"].to_numpy())
    np.testing.assert_allclose(got["pval"].to_numpy(),
                               want["pval"].to_numpy(), rtol=1e-12)


def test_sharded_scan_merge_roundtrip(tmp_path):
    """3 simulated hosts scan disjoint ranges; merged == full scan."""
    import saigegds_tpu as st
    from saigegds_tpu.config import ScanConfig
    from saigegds_tpu.parallel.distributed import (assoc_spa_sharded,
                                                   host_variant_range,
                                                   merge_shards)

    gds = "/root/reference/inst/extdata/grm1k_10k_snp.gds"
    model = "/root/reference/inst/unitTests/saige_model.rds"
    prefix = str(tmp_path / "scan")
    cnt = 3
    ranges = [host_variant_range(10000, pid, cnt) for pid in range(cnt)]
    assert ranges[0][0] == 0 and ranges[-1][1] == 10000
    for pid in range(cnt):
        assoc_spa_sharded(gds, model, prefix, ScanConfig(mac=4),
                          process_id=pid, process_count=cnt)
    merged = merge_shards(prefix)
    full = st.assoc_spa(gds, model, ScanConfig(mac=4))
    assert len(merged) == len(full)
    np.testing.assert_allclose(merged["pval"].to_numpy(),
                               full["pval"].to_numpy(), rtol=1e-12)


def test_make_mesh_overrequest_raises():
    with pytest.raises(ValueError, match="only"):
        make_mesh(jax.device_count() + 1)


def test_shard_grm_uneven_samples_raises(mesh, small_grm):
    odd = small_grm._replace(std_geno=small_grm.std_geno[:, :63],
                             diag=small_grm.diag[:63], n_samples=63)
    with pytest.raises(ValueError, match="must divide"):
        shard_grm(odd, mesh)


def test_uneven_variant_block_padded(mesh):
    """Trailing blocks that don't divide the mesh are zero-padded exactly."""
    from saigegds_tpu.models.nullmodel import NullModel
    from saigegds_tpu.ops.score import ScanParams, score_stats_binary
    from saigegds_tpu.io.seqarray import SeqData

    model = NullModel.load("/root/reference/inst/unitTests/saige_model.rds")
    seq = SeqData("/root/reference/inst/extdata/grm1k_10k_snp.gds")
    G = seq.dosage_block(0, 63)
    sm = model.scan_model()
    params = ScanParams(maf=-1.0, mac=4.0, missing=0.1, spa_pval=0.05)
    want = score_stats_binary(sm, params, jnp.asarray(G))
    got = score_stats_binary(replicate(mesh, sm), params,
                             shard_variant_batch(mesh, G))
    np.testing.assert_allclose(np.asarray(got.pval)[:63],
                               np.asarray(want.pval), rtol=1e-12)


def test_variant_sharded_scan_matches(mesh):
    """Score stats on a variant-sharded block == single-device result."""
    from saigegds_tpu.config import ScanConfig
    from saigegds_tpu.models.nullmodel import NullModel
    from saigegds_tpu.ops.score import ScanParams, score_stats_binary
    from saigegds_tpu.io.seqarray import SeqData

    model = NullModel.load("/root/reference/inst/unitTests/saige_model.rds")
    seq = SeqData("/root/reference/inst/extdata/grm1k_10k_snp.gds")
    G = seq.dosage_block(0, 64)
    sm = model.scan_model()
    params = ScanParams(maf=-1.0, mac=4.0, missing=0.1, spa_pval=0.05)

    want = score_stats_binary(sm, params, jnp.asarray(G))
    sm_rep = replicate(mesh, sm)
    Gs = shard_variant_batch(mesh, G)
    got = score_stats_binary(sm_rep, params, Gs)
    np.testing.assert_allclose(np.asarray(got.pval), np.asarray(want.pval),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got.beta), np.asarray(want.beta),
                               rtol=1e-12)


def test_sharded_streamed_build_matches_wrapped():
    """ShardedGrmHandle.from_streamed_blocks (per-block sharded placement,
    no unsharded [M, Np] stop-over) == wrapping the fully-built operator."""
    import numpy as np
    import jax.numpy as jnp
    from saigegds_tpu.ops.packed_grm import build_packed_grm
    from saigegds_tpu.parallel.mesh import ShardedGrmHandle, make_mesh

    rng = np.random.default_rng(4)
    M, N = 120, 1003                      # N not divisible by the mesh
    codes = rng.integers(0, 3, size=(M, N)).astype(np.int8)
    codes[rng.random((M, N)) < 0.02] = 3
    mesh = make_mesh(8)

    def blocks():
        for s in range(0, M, 37):
            yield np.arange(s, min(s + 37, M)), codes[s : s + 37]

    h1 = ShardedGrmHandle.from_streamed_blocks(blocks(), N, mesh)
    h2 = ShardedGrmHandle(build_packed_grm(codes), mesh)
    b = rng.normal(size=(N, 3))
    np.testing.assert_array_equal(h1.mv(b), h2.mv(b))
    w = rng.uniform(0.1, 0.3, N)
    x1, c1 = h1.pcg(w, np.array([1.0, 0.5]), b, 1e-8, 200)
    x2, c2 = h2.pcg(w, np.array([1.0, 0.5]), b, 1e-8, 200)
    # diag(GRM) accumulates in block order when streamed: the Jacobi
    # preconditioner differs at f64 ulp, so iterates agree to solver
    # precision (the matvec itself is exact, asserted above)
    np.testing.assert_allclose(x1, x2, rtol=1e-9, atol=1e-12)
    assert h1.n_samples == N and h1.n_variants == M
