"""Headline benchmark: score+SPA association-scan throughput (variants/s).

The reference's hot serving path is the per-variant score test + saddlepoint
refinement over millions of variants (src/saige_main.cpp:279-407,
src/SPATest.cpp).  Here the same statistics run as batched [B, N] kernels on
the TPU; the baseline is the identical f64 algebra in numpy/BLAS on the host
CPU — a faithful stand-in for the reference's AVX f64 C++ loops (which are
memory-bound dense vector ops, like BLAS level-2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

N_SAMPLES = 430_000   # UK-Biobank scale (BASELINE.json north star)
BLOCK = 2048          # packed int8 path: [B, N] codes are only 0.9 GB
N_BLOCKS = 8          # timed TPU blocks
BLOCK_CPU = 128
N_BLOCKS_CPU = 1      # timed CPU blocks (slow)
N_COV = 4
SPA_FRAC = 16         # refine B // SPA_FRAC variants per block (~6%)


def make_model(n, k, rng):
    X = np.column_stack([np.ones(n), rng.normal(size=(n, k - 1))])
    eta = X @ (rng.normal(size=k) * 0.3) - 2.0     # ~12% cases: SPA regime
    mu = 1.0 / (1.0 + np.exp(-eta))
    y = (rng.random(n) < mu).astype(np.float64)
    W = mu * (1 - mu)
    XV = (X * W[:, None]).T
    XXVX_inv = X @ np.linalg.inv(X.T @ (X * W[:, None]))
    return dict(X=X, y=y, mu=mu, W=W, XV=XV, XXVX_inv=XXVX_inv)


# ---------------------------------------------------------------------------
# CPU baseline: same algebra in numpy (reference-class f64 SIMD)

def cpu_scan_block(m, G):
    isnan = np.isnan(G)
    num = (~isnan).sum(axis=1)
    ac = np.where(isnan, 0.0, G).sum(axis=1)
    af = ac / (2 * num)
    g = np.where(isnan, (ac / num)[:, None], G)
    flip = af > 0.5
    g = np.where(flip[:, None], 2.0 - g, g)
    coeff = g @ m["XV"].T
    g_tilde = g - coeff @ m["XXVX_inv"].T
    S = g_tilde @ (m["y"] - m["mu"])
    var = (g_tilde * g_tilde) @ (m["W"])
    from scipy.stats import chi2
    pval = chi2.sf(S * S / var, 1)
    # SPA refinement for the flagged fraction: CGF Newton root-find
    idx = np.argsort(pval)[: G.shape[0] // SPA_FRAC]
    mu_, g_ = m["mu"], g_tilde[idx] / np.sqrt(np.maximum(ac[idx], 1))[:, None]
    q = g_ @ m["y"]
    m1 = g_ @ mu_
    for _ in range(2):                 # two-sided: root-find at q and 2 m1 - q
        t = np.zeros(len(idx))
        for _ in range(20):            # Newton iterations (ref does ~5-20)
            e = np.exp(np.clip(g_ * t[:, None], -700, 700))
            k1 = ((mu_ * g_ * e) / (1 - mu_ + mu_ * e)).sum(axis=1) - q
            k2 = ((mu_ * (1 - mu_) * g_ * g_ * e) /
                  (1 - mu_ + mu_ * e) ** 2).sum(axis=1)
            t = t - k1 / k2
        q = 2 * m1 - q
    return pval


# ---------------------------------------------------------------------------

def main():
    rng = np.random.default_rng(7)
    m = make_model(N_SAMPLES, N_COV, rng)

    # ---- CPU baseline ----
    af_draw = rng.uniform(0.01, 0.5, size=BLOCK_CPU)
    G_host = rng.binomial(2, af_draw[:, None],
                          size=(BLOCK_CPU, N_SAMPLES)).astype(np.float64)
    cpu_scan_block(m, G_host[:128])               # warm caches
    t0 = time.perf_counter()
    for _ in range(N_BLOCKS_CPU):
        cpu_scan_block(m, G_host)
    cpu_vps = N_BLOCKS_CPU * BLOCK_CPU / (time.perf_counter() - t0)

    # ---- TPU path ----
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from saigegds_tpu.ops.score import ScanModel, ScanParams, spa_refine_binary
    from saigegds_tpu.ops.score_packed import (pack_scan_model,
                                               score_stats_binary_packed)

    model = ScanModel(
        trait_binary=True, tau=jnp.asarray([1.0, 0.5]),
        y=jnp.asarray(m["y"]), mu=jnp.asarray(m["mu"]),
        y_mu=jnp.asarray(m["y"] - m["mu"]), mu2=jnp.asarray(m["W"]),
        XV=jnp.asarray(m["XV"]), XXVX_inv=jnp.asarray(m["XXVX_inv"]),
        var_ratio=0.93)
    pm = pack_scan_model(model)
    params = ScanParams(maf=0.0, mac=4.0, missing=0.1, spa_pval=0.05)

    n_spa = BLOCK // SPA_FRAC

    @jax.jit
    def scan_block(key, pm, model):
        k0, k1, k2 = jax.random.split(key, 3)
        # allele frequency quantized to 1/256: integer threshold compare
        thr = jax.random.randint(k0, (BLOCK, 1), 3, 128,
                                 dtype=jnp.int32).astype(jnp.uint8)
        r1 = jax.random.bits(k1, (BLOCK, N_SAMPLES), jnp.uint8)
        r2 = jax.random.bits(k2, (BLOCK, N_SAMPLES), jnp.uint8)
        codes = ((r1 < thr).astype(jnp.int8) + (r2 < thr).astype(jnp.int8))
        stats = score_stats_binary_packed(pm, params, codes)
        # gather the worst p-values into a compact SPA batch (fixed size)
        order = jnp.argsort(jnp.where(stats.need_spa, stats.pval, jnp.inf))
        take = order[:n_spa]
        Gf = codes[take].astype(jnp.float64)
        pval, conv, beta, se = spa_refine_binary(model, Gf, mixed=True)
        return stats.pval, take, pval

    keys = jax.random.split(jax.random.PRNGKey(0), N_BLOCKS + 1)
    warm = scan_block(keys[-1], pm, model)                      # compile
    float(warm[2][0])   # force execution: block_until_ready alone can
    t0 = time.perf_counter()                # return early on this backend
    outs = [scan_block(k, pm, model) for k in keys[:N_BLOCKS]]
    for o in outs:
        float(o[2][0])                          # scalar read-back per block
    tpu_vps = N_BLOCKS * BLOCK / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": f"score+SPA scan throughput, N={N_SAMPLES} samples",
        "value": round(tpu_vps, 2),
        "unit": "variants/s",
        "vs_baseline": round(tpu_vps / cpu_vps, 3),
    }))


if __name__ == "__main__":
    main()
