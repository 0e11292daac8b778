"""Real-TPU parity + timing artifact for the prefiltered exact cut
(PREFILTER_PARITY_r05.txt): the prefiltered cut must be bit-identical to
the exact streaming cut at the reference's full 96k-template regime on the
real chip, with the exactness proof holding on the test frame."""
import os, sys, time
import numpy as np
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import dataclasses
from linemod_tpu.config import load_settings
from linemod_tpu.models.template_bank import TemplateBank
from linemod_tpu.ops.matching import MatchConfig, build_match_state, match_templates
from linemod_tpu.pipeline.pose_detection import _pad_bank

cam, settings = load_settings(os.path.join(REPO, "example", "linemod_settings.yml"))
bank = TemplateBank.load(os.path.join(REPO, ".bigbank_cache_s3.npz"))
cfg_s = MatchConfig(width=cam.width, height=cam.height, top_k=512,
                    template_chunk=256, use_pallas=True, cut_block_rows=256,
                    scan_chunk=4096)
cfg_p = dataclasses.replace(cfg_s, prefilter_sel=1024)
padded = _pad_bank(bank, 4096)
state_s = build_match_state(padded, cfg_s)
state_p = build_match_state(padded, cfg_p)
rng = np.random.default_rng(0)
color = jnp.asarray(rng.uniform(0, 255, (cam.height, cam.width, 3)).astype(np.float32))
depth = jnp.zeros((cam.height, cam.width), jnp.float32)
lines = [f"prefilter parity at {bank.num_templates} templates (real TPU {jax.devices()[0].device_kind})"]
ref = match_templates(state_s, color, depth)
got = match_templates(state_p, color, depth)
lines.append(f"cut_exact proof: {bool(got['cut_exact'])}")
for k in ("template_id", "x", "y", "similarity", "valid"):
    same = np.array_equal(np.asarray(ref[k]), np.asarray(got[k]))
    lines.append(f"  {k}: {'IDENTICAL' if same else 'MISMATCH'}")
K = 20
def t_of(state):
    @jax.jit
    def run(c, d):
        def step(acc, i):
            return acc + match_templates(state, c + i.astype(jnp.float32), d)["similarity"].sum(), None
        return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(K))[0]
    np.asarray(run(color, depth))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(run(color, depth)); ts.append((time.perf_counter()-t0)/K)
    return min(ts)
lines.append(f"streaming exact cut: {t_of(state_s)*1e3:.2f} ms/frame")
lines.append(f"prefiltered exact cut: {t_of(state_p)*1e3:.2f} ms/frame")
out = "\n".join(lines)
print(out)
with open(os.path.join(REPO, "PREFILTER_PARITY_r05.txt"), "w") as f:
    f.write(out + "\n")
