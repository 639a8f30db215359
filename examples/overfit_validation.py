"""End-to-end learning validation: overfit the FULL yolo-pose net on 16
synthetic frames (generate them with _gen_synthetic_linemod.py first), then
run the complete eval suite.  On a TPU v5e this takes ~2 minutes and reaches
100% on all pose metrics (2D-reproj@5px, ADD-0.1d, 5cm-5deg) with sub-pixel
reprojection error — exercising model, loss, vectorized target assignment,
decode, batched PnP, and metrics in one loop.

Reproduces the reference's two-phase schedule: coordinate-only warmup
(pretrain_num_epochs gate) before enabling the confidence term
(reference: train.py --pretrain_num_epochs, region_loss.py:156-161).
"""
import os, sys, time, numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from singleshotpose_tpu.zoo import yolo_pose_single
from singleshotpose_tpu.ops.losses import RegionLossConfig
from singleshotpose_tpu.training import init_train_state, make_train_step
from singleshotpose_tpu.data.pipeline import Loader, PoseDataset
from singleshotpose_tpu.utils.labels import read_truths
from singleshotpose_tpu.drivers import run_validation

net = yolo_pose_single(test_size=416)
state = init_train_state(*net.init_params(jax.random.PRNGKey(0)))
cfg = RegionLossConfig.single(pretrain_num_epochs=15)  # conf gated until "epoch" 15
step = make_train_step(net, cfg, weight_decay=0.0, momentum=0.9,
                       fused_stem=jax.default_backend() == "tpu")

ds = PoseDataset("/tmp/ssp_learn/train.txt", train=False)
ld = Loader(ds, batch_size=16, fixed_shape=(416,416), shuffle=False, num_workers=2, drop_last=False)
imgs_np, _ = next(iter(ld))
full = np.zeros((16, 50*21), np.float32)
for i, line in enumerate(ds.lines):
    tr = read_truths(line.replace("JPEGImages","labels").replace(".jpg",".txt")).reshape(-1)
    full[i,:tr.size]=tr
imgs = jax.device_put(jnp.asarray(imgs_np)); tgt = jax.device_put(jnp.asarray(full))

t0=time.time()
for it in range(600):
    epoch = 0 if it < 250 else 100     # phase 1: coords only; phase 2: + conf
    lr = 1e-5
    state, stats = step(state, imgs, tgt, np.float32(lr), np.int32(epoch))
    if it % 100 == 0:
        print(f"it {it:4d}: loss {float(stats['loss']):9.4f} conf {float(stats['loss_conf']):7.3f} "
              f"correct {int(stats['nCorrect'])}/16 ({time.time()-t0:.0f}s)", flush=True)

summary = run_validation("/tmp/ssp_learn/synth.data", net,
                         params=state.params, batch_stats=state.batch_stats,
                         batch_size=16, num_workers=2, verbose=False)
print({k: (round(v,2) if isinstance(v,float) else v) for k,v in summary.items()})

if "--quantize" in sys.argv:
    # int8 serving on the trained net: pose metrics should match bf16 serving
    q = run_validation("/tmp/ssp_learn/synth.data", net,
                       params=state.params, batch_stats=state.batch_stats,
                       batch_size=16, num_workers=2, verbose=False,
                       quantize=True)
    print("int8:", {k: (round(v,2) if isinstance(v,float) else v)
                    for k,v in q.items()})
