import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax

# 1) app entry on synthetic (TPU) — exercises tracker + eval artifact path
from umetrack_tpu.apps import run_eval_known_skeleton
import tempfile
d = tempfile.mkdtemp()
run_eval_known_skeleton.main([
    "--output-dir", os.path.join(d, "eval_results_known_skeleton/real/separate_hand"),
    "--synthetic", "1", "--synthetic-frames", "8",
])
print("app synthetic eval OK", flush=True)

# 2) streaming eval on TPU with chunk carry (new round-2 path)
from umetrack_tpu.models import init_model
from umetrack_tpu.tracker import HandTracker
from umetrack_tpu.tracker.video import SequenceData, stream_from_data
from umetrack_tpu.apps.sequence_eval import (
    eval_sequence_known, eval_sequence_known_streaming,
)
from umetrack_tpu.utils import synthetic

labels, images = synthetic.make_labels_dict(12, rng_seed=3)
rig, obs_seq, hand = synthetic.our_sequence(labels, images)
seq = SequenceData(
    images=np.asarray(obs_seq.images),
    T_world_from_camera=np.asarray(obs_seq.T_world_from_camera),
    gt_joint_angles=np.asarray(obs_seq.gt_joint_angles),
    gt_wrist_xfs=np.asarray(obs_seq.gt_wrist_xfs),
    gt_confidences=np.asarray(obs_seq.gt_confidences),
    rig=rig, hand_model_mm=hand, n_frames=12,
)
model, variables = init_model(jax.random.PRNGKey(0))
tracker = HandTracker(model, variables)
whole = eval_sequence_known(tracker, seq)
chunked = eval_sequence_known_streaming(tracker, stream_from_data(seq), chunk=4)
dmax = max(
    float(np.max(np.abs(whole[k].astype(np.float64) - chunked[k].astype(np.float64)))) for k in whole
)
print("streaming-vs-whole max abs diff on TPU:", dmax, flush=True)
assert dmax < 1e-3, dmax

# 3) TBPTT train step on TPU
import optax
from umetrack_tpu.apps.train import synthetic_batches
from umetrack_tpu.parallel import create_train_state, temporal_train_step, LossWeights
opt = optax.adam(1e-4)
ts = create_train_state(variables, opt)
b = next(synthetic_batches(2, (96, 96), window=3))
ts, m = temporal_train_step(model, opt, ts, b, LossWeights())
print("TBPTT step on TPU: loss =", float(m["loss"]), flush=True)
assert np.isfinite(float(m["loss"]))
print("VERIFY_DRIVE_OK", flush=True)
