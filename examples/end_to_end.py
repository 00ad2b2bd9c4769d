"""End-to-end workflow on the bundled 1000-sample data.

The Python analog of the reference vignette (vignettes/SAIGEgds.Rmd):
fit the null GLMM, scan all variants with SPA, run aggregate tests over
sliding windows, a GxG pair, and the summary utilities.

Run:  PYTHONPATH=. python examples/end_to_end.py [--platform cpu]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="",
                    help="jax platform override (e.g. cpu)")
args = parser.parse_args()
if args.platform:
    os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    jax.config.update("jax_platforms", args.platform)

import numpy as np
import pandas as pd

import saigegds_tpu as st
from saigegds_tpu.config import AggregateConfig, NullModelConfig, ScanConfig
from saigegds_tpu.io.seqarray import SeqData
from saigegds_tpu.assoc.aggregate import sliding_windows

REF = "/root/reference/inst/extdata"
GDS = f"{REF}/grm1k_10k_snp.gds"

print(st.device_info())
pheno = pd.read_csv(f"{REF}/pheno.txt.gz", sep="\t")
tmp = tempfile.mkdtemp()

# 1. null model (seqFitNullGLMM_SPA)
with st.phase_timer("null GLMM fit"):
    model = st.fit_null_glmm("y ~ x1 + x2", pheno, GDS,
                             NullModelConfig(trait_type="binary"),
                             model_savefn=f"{tmp}/model.npz")
print(model)
print(f"heritability: {st.glmm_heritability(model):.4f}")

# 2. single-variant scan (seqAssocGLMM_SPA) -> SAIGE_OUTPUT gds
with st.phase_timer("score+SPA scan"):
    assoc = st.assoc_spa(GDS, f"{tmp}/model.npz", ScanConfig(mac=4),
                         res_savefn=f"{tmp}/assoc.gds")
top = assoc.nsmallest(3, "pval")[["id", "chr", "pos", "pval", "beta"]]
print("top hits:\n", top.to_string(index=False))

# 3. aggregate tests over sliding windows
seq = SeqData(GDS)
units = sliding_windows(seq, win_size=200, win_shift=100)
with st.phase_timer("ACAT-O sliding windows"):
    acato = st.assoc_acat_o(GDS, model, units, AggregateConfig())
print(f"ACAT-O: {len(acato)} windows, min p "
      f"{np.nanmin(acato['pval']):.3e}")

# 4. GxG interaction for one pair
pairs = pd.DataFrame({"id1": [int(top['id'].iloc[0])],
                      "id2": [int(top['id'].iloc[1])]})
with st.phase_timer("GxG pair"):
    gxg = st.gxg_spa("y ~ x1 + x2", pheno, GDS, pairs)
print("GxG:\n", gxg[["id1", "id2", "pval", "beta"]].to_string(index=False))

# 5. results loading / merging
merged = st.load_pval(f"{tmp}/assoc.gds")
print(f"reloaded {len(merged)} rows from SAIGE_OUTPUT gds; "
      f"ACAT of top 3: {st.acat_p(top['pval'].to_numpy()):.3e}")
