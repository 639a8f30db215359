"""Generate a 16-frame synthetic LINEMOD-format dataset (textured box
rendered at known poses) under --out. Companion to overfit_validation.py."""
import argparse
_ap = argparse.ArgumentParser(); _ap.add_argument("--out", default="/tmp/ssp_learn")
BASE = _ap.parse_args().out
import numpy as np, os
from PIL import Image
rng = np.random.RandomState(5)
base=BASE
for d in ("JPEGImages","mask","labels"): os.makedirs(f"{base}/obj/{d}", exist_ok=True)
K = np.array([[572.4114,0,325.2611],[0,573.5704,242.0489],[0,0,1]],np.float32)
pts = np.array([[0,0,0]]+[[sx*.045,sy*.035,sz*.04] for sx in(-1,1) for sy in(-1,1) for sz in(-1,1)],np.float32)
paths=[]
for i in range(16):
    w=rng.randn(3)*.5; th=np.linalg.norm(w)
    Kx=np.array([[0,-w[2],w[1]],[w[2],0,-w[0]],[-w[1],w[0],0]])
    R=np.eye(3)+np.sin(th)/th*Kx+(1-np.cos(th))/th**2*Kx@Kx
    t=np.array([rng.uniform(-.06,.06),rng.uniform(-.05,.05),rng.uniform(.55,.8)])
    cam=pts@R.T+t; pix=cam@K.T; pix=pix[:,:2]/pix[:,2:3]
    # render: project a dense point cloud of the box surface with per-face color
    img=np.zeros((480,640,3),np.uint8)
    img[:]=rng.randint(0,80,3)  # dark bg (will be replaced by bg augment anyway)
    m=np.zeros((480,640),np.uint8)
    surf=[]
    for f in range(400):
        u,v=rng.uniform(-1,1,2)
        face=rng.randint(6)
        p=np.array([u*.045, v*.035, (.04 if face==0 else -.04)]) if face<2 else \
          np.array([u*.045, (.035 if face==2 else -.035), v*.04]) if face<4 else \
          np.array([(.045 if face==4 else -.045), u*.035, v*.04])
        surf.append((p,face))
    colors=rng.randint(60,255,(6,3))
    depth=np.full((480,640),1e9)
    for p,face in surf:
        c=(R@p+t); px=K@c; x,y=int(px[0]/px[2]),int(px[1]/px[2])
        if 0<=x<640-6 and 0<=y<480-6 and c[2]<depth[y,x]:
            img[y:y+6,x:x+6]=colors[face]; m[y:y+6,x:x+6]=255; depth[y,x]=c[2]
    name=f"00{i:04d}"
    Image.fromarray(img).save(f"{base}/obj/JPEGImages/{name}.jpg")
    Image.fromarray(m).save(f"{base}/obj/mask/{name[2:]}.png")
    lab=np.zeros(21,np.float32)
    lab[1:19:2]=pix[:,0]/640; lab[2:19:2]=pix[:,1]/480
    lab[19:21]=[np.ptp(pix[:,0])/640, np.ptp(pix[:,1])/480]
    np.savetxt(f"{base}/obj/labels/{name}.txt",lab[None])
    paths.append(f"{base}/obj/JPEGImages/{name}.jpg")
open(f"{base}/train.txt","w").write("\n".join(paths)+"\n")
v=pts[1:]
ply=["ply","format ascii 1.0",f"element vertex {len(v)}","property float x","property float y","property float z","element face 0","property list uchar int vertex_indices","end_header"]+[f"{a} {b} {c}" for a,b,c in v]
open(f"{base}/obj.ply","w").write("\n".join(ply)+"\n")
open(f"{base}/synth.data","w").write(f"""train = {base}/train.txt
valid = {base}/train.txt
backup = {base}/backup
mesh = {base}/obj.ply
name = synthbox
diam = 0.107
gpus = 0
num_workers = 2
width = 640
height = 480
fx = 572.4114
fy = 573.5704
u0 = 325.2611
v0 = 242.0489
""")
print("generated 16 frames")
