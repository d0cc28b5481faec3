"""Mask R-CNN: RoIAlign numerics vs a numpy oracle, full model shapes,
training loss + grads (BASELINE config #5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.ops.roi_align import paste_masks, roi_align


def np_roi_align(feat, boxes, out_size, scale=1.0, sr=2):
    """Literal numpy RoIAlign (torchvision aligned=False semantics)."""
    h, w, c = feat.shape

    def sample(y, x):
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        wy, wx = y - y0, x - x0
        out = np.zeros(c, np.float32)
        if y < -1 or y > h or x < -1 or x > w:
            return out
        for dy, fy in ((0, 1 - wy), (1, wy)):
            for dx, fx in ((0, 1 - wx), (1, wx)):
                yy, xx = min(max(y0 + dy, 0), h - 1), min(max(x0 + dx, 0), w - 1)
                out += fy * fx * feat[yy, xx]
        return out

    outs = np.zeros((len(boxes), out_size, out_size, c), np.float32)
    for ri, b in enumerate(boxes):
        x1, y1, x2, y2 = b * scale
        bw = max(x2 - x1, 1.0)
        bh = max(y2 - y1, 1.0)
        for oy in range(out_size):
            for ox in range(out_size):
                acc = np.zeros(c, np.float32)
                for sy in range(sr):
                    for sx in range(sr):
                        y = y1 + bh / out_size * (oy + (sy + 0.5) / sr) - 0.5
                        x = x1 + bw / out_size * (ox + (sx + 0.5) / sr) - 0.5
                        acc += sample(y, x)
                outs[ri, oy, ox] = acc / (sr * sr)
    return outs


def test_roi_align_matches_numpy_oracle(rng):
    feat = rng.normal(size=(12, 16, 3)).astype(np.float32)
    boxes = np.asarray([[2.0, 3.0, 10.0, 9.0], [0.0, 0.0, 16.0, 12.0],
                        [5.5, 2.5, 7.5, 6.0]], np.float32)
    ref = np_roi_align(feat, boxes, 4)
    out = np.asarray(roi_align(feat[None], jnp.asarray(boxes)[None], 4))[0]
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_paste_masks_geometry():
    mask = jnp.ones((1, 4, 4))
    boxes = jnp.asarray([[4.0, 4.0, 12.0, 12.0]])
    out = np.asarray(paste_masks(mask, boxes, (16, 16)))[0]
    assert out[8, 8] > 0.9           # inside the box
    assert out[1, 1] == 0.0          # outside
    assert out[14, 14] == 0.0


@pytest.fixture(scope="module")
def tiny_mask_rcnn():
    from tlxcv_tpu.models.classification import resnet18
    from tlxcv_tpu.models.detection import MaskRCNN

    return MaskRCNN(num_classes=4, num_proposals=16, pre_nms_top_k=64,
                    detections_per_image=8,
                    backbone=resnet18(num_classes=0, with_pool=False))


def test_mask_rcnn_eval_shapes(tiny_mask_rcnn, rng):
    model = tiny_mask_rcnn
    params, state = split(model)
    fwd = pure(model)
    x = jnp.asarray(rng.normal(size=(1, 128, 128, 3)), jnp.float32)
    (dets, counts, masks), _ = jax.jit(lambda p, s, x: fwd(p, s, x))(
        params, state, x)
    assert dets.shape == (1, 8, 6)
    assert counts.shape == (1,)
    assert masks.shape == (1, 8, 28, 28)
    pasted = model.paste(masks, dets, counts, (128, 128))
    assert pasted.shape == (1, 8, 128, 128)


def test_mask_rcnn_train_loss(tiny_mask_rcnn, rng):
    model = tiny_mask_rcnn
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(1, 128, 128, 3)), jnp.float32)
    boxes = np.asarray([[[10, 10, 60, 70], [40, 50, 100, 110], [0, 0, 0, 0]]],
                       np.float32)
    gt_masks = np.zeros((1, 3, 128, 128), np.float32)
    gt_masks[0, 0, 10:70, 10:60] = 1
    gt_masks[0, 1, 50:110, 40:100] = 1
    targets = {"boxes": jnp.asarray(boxes),
               "class_labels": jnp.asarray([[1, 2, 0]], jnp.int32),
               "mask": jnp.asarray([[1, 1, 0]], jnp.float32),
               "masks": jnp.asarray(gt_masks)}

    lp = pure(model, lambda m, x, t: m.loss_fn(m(x), t))
    loss, _ = jax.jit(lambda p, s: lp(p, s, x, targets, training=True))(
        params, state)
    assert np.isfinite(float(loss)) and float(loss) > 0
    g = jax.grad(lambda p: lp(p, state, x, targets, training=True)[0])(params)
    gn = sum(float(jnp.abs(v).sum()) for v in g.values())
    assert np.isfinite(gn) and gn > 0
    assert float(jnp.abs(g["mask_head/pred/weight"]).sum()) > 0
    assert float(jnp.abs(g["rpn_head/conv/weight"]).sum()) > 0


def test_mask_rcnn_loss_finite_with_zero_gt(tiny_mask_rcnn, rng):
    """An image with NO valid GTs (real COCO has ~1k of them) gathers a
    padded all-zero target row; the bbox2delta log(0) = -inf used to NaN
    the masked `loss * posf` reductions (inf * 0)."""
    model = tiny_mask_rcnn
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(1, 128, 128, 3)), jnp.float32)
    targets = {"boxes": jnp.zeros((1, 3, 4), jnp.float32),
               "class_labels": jnp.zeros((1, 3), jnp.int32),
               "mask": jnp.zeros((1, 3), jnp.float32),
               "masks": jnp.zeros((1, 3, 128, 128), jnp.float32)}

    lp = pure(model, lambda m, x, t: m.loss_fn(m(x), t))
    loss, _ = jax.jit(lambda p, s: lp(p, s, x, targets, training=True))(
        params, state)
    assert np.isfinite(float(loss)), float(loss)
    g = jax.grad(lambda p: lp(p, state, x, targets, training=True)[0])(params)
    gn = sum(float(jnp.abs(v).sum()) for v in g.values())
    assert np.isfinite(gn)
