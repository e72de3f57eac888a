import os, sys, time, json, tempfile
import numpy as np
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax; jax.config.update("jax_platforms", "cpu")
import cv2

root = tempfile.mkdtemp()
os.makedirs(os.path.join(root, "annotations"))
os.makedirs(os.path.join(root, "images", "val2017"))
os.makedirs(os.path.join(root, "teacher"))
rng = np.random.RandomState(0)
images, annotations = [], []
aid = 1
N = 32
for i in range(N):
    img_id = 1000 + i
    h, w = 480, 640
    fname = f"{img_id:012d}.jpg"
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    cv2.imwrite(os.path.join(root, "images", "val2017", fname), img)
    images.append({"id": img_id, "file_name": fname, "height": h, "width": w})
    for p in range(3):
        cx, cy = rng.randint(50, 500), rng.randint(50, 400)
        kps = []
        for j in range(17):
            kps += [int(cx + (j % 5) * 3), int(cy + (j // 5) * 4), 2]
        annotations.append({
            "id": aid, "image_id": img_id, "category_id": 1,
            "keypoints": kps, "num_keypoints": 17, "iscrowd": 0,
            "area": 625.0, "bbox": [cx - 5, cy - 5, 25, 25],
            "segmentation": [[cx-5, cy-5, cx+20, cy-5, cx+20, cy+20, cx-5, cy+20]]})
        aid += 1
    # teacher npz at half/quarter res like the real corpus
    from rtpe_tpu.data.teacher_cache import save_teacher_prediction
    coarse = rng.rand(h//4, w//4, 34).astype(np.float32)
    refined = rng.rand(h//2, w//2, 17).astype(np.float32)
    save_teacher_prediction(os.path.join(root, "teacher"), fname, coarse, refined)
with open(os.path.join(root, "annotations", "person_keypoints_val2017.json"), "w") as f:
    json.dump({"images": images, "annotations": annotations,
               "categories": [{"id": 1, "name": "person", "keypoints": ["k"]*17}]}, f)

from rtpe_tpu.data.dataset import CocoDistillationDataset
from rtpe_tpu.data.pipeline import TrainPipeline
ds = CocoDistillationDataset(root, "val2017",
                             teacher_output_dir=os.path.join(root, "teacher"),
                             gt_stddevs_pix=[7.0])
t0 = time.time(); s = ds[0]; print(f"one ds[i]: {(time.time()-t0)*1e3:.0f} ms; "
    f"keys {[(k, getattr(v,'shape',None)) for k,v in s.items() if hasattr(v,'shape')]}")

for nw in (1, 4):
    pipe = TrainPipeline(ds, batch_size=16, num_workers=nw)
    t0 = time.time(); n = 0
    for hb in pipe.host_batches():
        n += 16
    dt = time.time() - t0
    print(f"num_workers={nw}: host feed {n/dt:.1f} img/s ({dt:.2f}s for {n})")
