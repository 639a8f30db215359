"""Multi-object end-to-end learning validation: 3 synthetic objects of
distinct classes per frame, full yolo-pose-multi net (5 anchors, 13
classes).  On a TPU v5e (~2 min): 100% 2D-reproj accuracy at 5 px over all
24 object instances, ~0.8 px mean error — proving anchor assignment, the
CE class loss, and the class-picked decode learn multi-object 6D pose."""
import sys, time, numpy as np
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from singleshotpose_tpu.zoo import yolo_pose_multi
from singleshotpose_tpu.ops.losses import RegionLossConfig
from singleshotpose_tpu.ops.decode import decode_grid, best_box_for_class
from singleshotpose_tpu.training import init_train_state, make_train_step
from singleshotpose_tpu.models.darknet import fold_batchnorm
from singleshotpose_tpu.evaluate import EvalContext, PoseErrors, pose_metrics, multi_accuracy_table

rng = np.random.RandomState(7)
K = np.array([[572.4114,0,325.2611],[0,573.5704,242.0489],[0,0,1]],np.float32)
pts = np.array([[0,0,0]]+[[sx*.045,sy*.035,sz*.04] for sx in(-1,1) for sy in(-1,1) for sz in(-1,1)],np.float32)

B = 8
imgs = np.zeros((B,416,416,3),np.float32)
tgt = np.zeros((B,50*21),np.float32)
gt_per_img = []
colors = rng.randint(60,255,(13,6,3))
for b in range(B):
    canvas = rng.randint(0,60,(480,640,3)).astype(np.uint8)
    tt = tgt[b].reshape(50,21)
    gts = []
    for slot, cls in enumerate([1, 4, 7]):   # 3 distinct classes per image
        w=rng.randn(3)*.4; th=np.linalg.norm(w)
        Kx=np.array([[0,-w[2],w[1]],[w[2],0,-w[0]],[-w[1],w[0],0]])
        R=np.eye(3)+np.sin(th)/th*Kx+(1-np.cos(th))/th**2*Kx@Kx
        t=np.array([(-0.15 + 0.15*slot) + rng.uniform(-.02,.02), rng.uniform(-.04,.04), rng.uniform(.6,.75)])
        cam=pts@R.T+t; pix=cam@K.T; pix=pix[:,:2]/pix[:,2:3]
        for f in range(300):
            u,v=rng.uniform(-1,1,2); face=rng.randint(6)
            p=np.array([u*.045, v*.035, (.04 if face==0 else -.04)]) if face<2 else \
              np.array([u*.045, (.035 if face==2 else -.035), v*.04]) if face<4 else \
              np.array([(.045 if face==4 else -.045), u*.035, v*.04])
            c=(R@p+t); px=K@c; x,y=int(px[0]/px[2]),int(px[1]/px[2])
            if 0<=x<634 and 0<=y<474:
                canvas[y:y+6,x:x+6]=colors[cls,face]
        tt[slot,0]=cls
        tt[slot,1:19:2]=pix[:,0]/640; tt[slot,2:19:2]=pix[:,1]/480
        tt[slot,19:21]=[np.ptp(pix[:,0])/640, np.ptp(pix[:,1])/480]
        gts.append((cls, pix.copy()))
    gt_per_img.append(gts)
    from singleshotpose_tpu.data.augment import resize_nearest
    imgs[b] = resize_nearest(canvas,416,416).astype(np.float32)/255.0

net = yolo_pose_multi()
state = init_train_state(*net.init_params(jax.random.PRNGKey(0)))
cfg = RegionLossConfig.multi(anchors=net.anchors, pretrain_num_epochs=15)
step = make_train_step(net, cfg, weight_decay=0.0, momentum=0.9,
                       fused_stem=jax.default_backend() == "tpu")
imgs_d = jax.device_put(jnp.asarray(imgs)); tgt_d = jax.device_put(jnp.asarray(tgt))

t0=time.time()
for it in range(800):
    epoch = 0 if it < 350 else 100
    state, stats = step(state, imgs_d, tgt_d, np.float32(8e-6), np.int32(epoch))
    if it % 200 == 0:
        print(f"it {it:4d}: loss {float(stats['loss']):9.3f} cls {float(stats['loss_cls']):7.3f} "
              f"conf {float(stats['loss_conf']):8.3f} correct {int(stats['nCorrect'])}/24 ({time.time()-t0:.0f}s)", flush=True)

# eval: per-GT class-picked boxes
folded = fold_batchnorm(net, state.params, state.batch_stats)
head = net.apply_folded(folded, imgs_d, compute_dtype=jnp.bfloat16)
decoded = decode_grid(head.astype(jnp.float32), 9, 13, 5)
ctx = EvalContext(pts, np.concatenate([pts[1:].T, np.ones((1,8),np.float32)]), K, 0.107, 640, 480)
errs = PoseErrors()
for b in range(B):
    for cls, pix_gt in gt_per_img[b]:
        box = np.asarray(best_box_for_class(decoded, cls, 0.05))[b]
        pr = box[:18].reshape(9,2)*[640,480]
        m = pose_metrics(pix_gt[None].astype(np.float32), pr[None].astype(np.float32), ctx)
        errs.extend(m)
print("n:", len(errs), "acc table:", multi_accuracy_table(errs.errs_2d))
print("mean 2d err:", round(float(np.mean(errs.errs_2d)),2), "px")
