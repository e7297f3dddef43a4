"""Diagnose the v2 probe=0.2 result: is the model unable to separate the five
profiles, or do the twin generators (device jax vs on-disk np) diverge?"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from dinox_tpu.data.synthetic import make_jax_batch_fn, PROFILE_NAMES_V2
from dinox_tpu.evaluation.embedder import eval_transform, _l2n
from dinox_tpu.data.index import load_index_rows
from sklearn.linear_model import LogisticRegression

import importlib.util
spec = importlib.util.spec_from_file_location(
    "ep", "/root/repo/scripts/evaluate_panorgan.py")
ep = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ep)
model = ep.load_any_model("data/runs_r3/v2_10k")
print("model loaded, scale_aware:", model.scale_aware, flush=True)

# --- device-domain (training distribution) sample
make = jax.jit(make_jax_batch_fn(512, 64))
pix, sps, dss = [], [], []
for i in range(4):
    px, sp, ds = make(jax.random.key(100 + i))
    pix.append(np.asarray(px)); sps.append(np.asarray(sp)); dss.append(np.asarray(ds))
pix = np.concatenate(pix); sps = np.concatenate(sps); dss = np.concatenate(dss)
print("device-domain sample:", pix.shape, np.bincount(dss, minlength=5), flush=True)

def embed(pixels, spacing):
    out = []
    for i in range(0, len(pixels), 16):
        x = eval_transform(jnp.asarray(pixels[i:i+16]), img_size=model.img_size)
        sp = jnp.asarray(spacing[i:i+16]) if model.scale_aware else None
        out.append(np.asarray(model(x, sp)[:, 0], np.float32))
    return _l2n(np.concatenate(out))

emb_dev = embed(pix, sps)
print("device embedded", emb_dev.shape, flush=True)

# --- disk-domain (eval distribution) sample
rows = load_index_rows("data/synth_v2_eval/index.csv")
rng = np.random.default_rng(0)
# balanced sample across datasets
byds = {}
for r in rows:
    byds.setdefault(r.dataset, []).append(r)
sel = []
for k, v in byds.items():
    idx = rng.choice(len(v), size=min(50, len(v)), replace=False)
    sel += [v[i] for i in idx]
name_to_i = {n: i for i, n in enumerate(PROFILE_NAMES_V2)}
from dinox_tpu.evaluation.embedder import embed_rows
emb_disk, sp_disk = embed_rows(model, sel, batch_size=16)
y_disk = np.asarray([name_to_i[r.dataset] for r in sel])
print("disk embedded", emb_disk.shape, np.bincount(y_disk, minlength=5), flush=True)

def probe(emb_tr, y_tr, emb_te, y_te, tag):
    clf = LogisticRegression(max_iter=1000, random_state=0)
    clf.fit(emb_tr, y_tr)
    acc = float((clf.predict(emb_te) == y_te).mean())
    print(f"probe {tag}: acc={acc:.3f}", flush=True)
    return acc

n = len(emb_dev); half = n // 2
probe(emb_dev[:half], dss[:half], emb_dev[half:], dss[half:], "device->device")
m = len(emb_disk); halfm = m // 2
perm = rng.permutation(m)
emb_disk, y_disk = emb_disk[perm], y_disk[perm]
probe(emb_disk[:halfm], y_disk[:halfm], emb_disk[halfm:], y_disk[halfm:], "disk->disk(random split)")
probe(emb_dev, dss, emb_disk, y_disk, "device->disk")
probe(emb_disk, y_disk, emb_dev, dss, "disk->device")
