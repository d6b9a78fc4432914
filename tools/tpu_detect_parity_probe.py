import sys; sys.path.insert(0, "/root/repo")
import dataclasses
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bayesod")
import jax.numpy as jnp
import numpy as np
from flax import traverse_util as tu
from bayesod_tpu.infer import jit_detect_fn
from bayesod_tpu.models.retinanet import RetinaNet, init_variables
from bayesod_tpu.utils.config import load_config
from bayesod_tpu.data.preprocess import normalize_images
from bayesod_tpu.data.synthetic import SyntheticDataset

cfg0 = load_config("configs/flagship_synthetic.yaml")
model = RetinaNet(cfg=cfg0.model, train=False)
v = init_variables(model, jax.random.PRNGKey(0), cfg0.data.image_hw)
arch = np.load("data/outputs/flagship_r4/weights.npz")
new_vars = dict(v)
for coll in ("params", "batch_stats"):
    if coll not in v: continue
    flat = tu.flatten_dict(dict(v[coll]), sep="/")
    loaded = {k: jnp.asarray(arch[f"{coll}/{k}"]).astype(flat[k].dtype) for k in flat}
    new_vars[coll] = tu.unflatten_dict({tuple(k.split("/")): x for k, x in loaded.items()})
v = new_vars
ds = SyntheticDataset(size=8, image_hw=cfg0.data.image_hw)
images = normalize_images(
    jnp.asarray(np.stack([ds.example(i)["image"] for i in range(8)])),
    cfg0.data.mean, cfg0.data.std)
rng = jax.random.PRNGKey(1)
outs = {}
for sort in (True, False):
    bayes = dataclasses.replace(
        cfg0.bayes, candidate_sort=sort, pre_cluster_topk=256,
        score_threshold=0.05)
    c = dataclasses.replace(cfg0, bayes=bayes)
    m = RetinaNet(cfg=c.model, train=False)
    out = jit_detect_fn(c, m)(v, images, rng)
    outs[sort] = jax.tree_util.tree_map(np.asarray, out)
a, b = outs[True], outs[False]
print("valid counts:", a.valid.sum(), b.valid.sum())
print("boxes max|d|:", np.abs(a.boxes - b.boxes).max())
print("probs max|d|:", np.abs(a.probs - b.probs).max())
print("covs max|d| rel:", np.abs(a.covs - b.covs).max() / max(np.abs(b.covs).max(), 1e-9))
print("cov min eig proxy (diag min):", a.covs.reshape(-1,4,4).diagonal(0,1,2).min(), b.covs.reshape(-1,4,4).diagonal(0,1,2).min())

# Round-5 postmortem note: this probe caught a TPU-only exactness bug the
# CPU suite could not — candidate_unsort's einsum at DEFAULT TPU matmul
# precision rounds its fp32 payload through bf16 (one-pass fp32 matmul),
# which catastrophic-cancels the downstream E[x^2]-E[x]^2 epistemic
# covariance into negative variances. CPU fp32 matmuls are exact, so
# interpret-mode parity was green. Run this ON TPU after touching any
# one-hot-matmul data-movement path.
