import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time
import numpy as np, jax, jax.numpy as jnp
from umetrack_tpu.ops.pallas_resample import pallas_bilinear_sample
from umetrack_tpu.ops.resample import bilinear_sample

rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 256, (480, 640)).astype(np.float32))
coords = jnp.asarray(rng.uniform(-5, 650, (96, 96, 2)).astype(np.float32))
out_p = np.asarray(pallas_bilinear_sample(img, coords))
out_g = np.asarray(bilinear_sample(img, coords, method='gather1d'))
print('v3 standalone random coords maxdiff:', float(np.max(np.abs(out_p - out_g))), flush=True)

# smooth coords (windowed path hot)
gy, gx = np.mgrid[0:96, 0:96].astype(np.float32)
sc = np.stack([gx * 2.1 + 30.3, gy * 1.7 + 100.2], axis=-1)
out_p = np.asarray(pallas_bilinear_sample(img, jnp.asarray(sc)))
out_g = np.asarray(bilinear_sample(img, jnp.asarray(sc), method='gather1d'))
print('v3 smooth coords maxdiff:', float(np.max(np.abs(out_p - out_g))), flush=True)

# batched tracker prep, S-vmap (the condition where v2 showed 6.5e-3)
from umetrack_tpu.tracker import TrackerConfig
from umetrack_tpu.tracker import tracker as trk
from umetrack_tpu.utils import synthetic
labels, images = synthetic.make_labels_dict(16, rng_seed=0)
rig, seq, hand = synthetic.our_sequence(labels, images)
cfg = TrackerConfig()
s = 8
stack = lambda x: jax.tree_util.tree_map(lambda a: jnp.stack([a] * s), x)
rigs, hands, seqs = stack(rig), stack(hand), stack(seq)
n_warps = s * 16 * 4
outs = {}
for name in ['gather1d', 'pallas']:
    scfg = TrackerConfig(sampler=name)
    @jax.jit
    def prep(rigs, seqs, hands, scfg=scfg):
        cs, ci = jax.vmap(lambda r, q, h: trk._prepare_sequence(scfg, r, q, h, 1))(rigs, seqs, hands)
        return ci
    ci = prep(rigs, seqs, hands)
    outs[name] = np.asarray(ci)
    t0 = time.perf_counter()
    reps = [prep(rigs, seqs, hands) for _ in range(3)]
    for r_ in reps: np.asarray(r_[0,0,0,0,0,0])
    dt = (time.perf_counter() - t0) / 3
    print(f'{name}: {dt*1e3:.1f} ms ({dt/n_warps*1e6:.1f} us/warp)', flush=True)
d = np.abs(outs['gather1d'] - outs['pallas'])
i = np.unravel_index(np.argmax(d), d.shape)
print('S-vmap prep maxdiff:', float(d.max()), 'at (s,t,hand,view,y,x)', i)
print('n>1e-3:', int((d > 1e-3).sum()), 'per-seq maxdiff:', [float(d[j].max()) for j in range(s)])
