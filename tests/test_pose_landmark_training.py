"""Pose and landmark verticals close the loop to their metrics:
HRNet overfits synthetic heatmaps to PCK ~1; PFLD overfits landmarks to
a small NME."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tlxcv_tpu.core import Rngs, pure, split


def _gaussian_heatmaps(joints, hw, sigma=1.5):
    """joints [B, J, 2] normalized -> [B, h, w, J] heatmaps."""
    b, j, _ = joints.shape
    h, w = hw
    ys = np.arange(h)[:, None]
    xs = np.arange(w)[None, :]
    maps = np.zeros((b, h, w, j), np.float32)
    for bi in range(b):
        for ji in range(j):
            cx, cy = joints[bi, ji] * [w, h]
            maps[bi, :, :, ji] = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2)
                                        / (2 * sigma ** 2))
    return maps


def test_pose_hrnet_overfits_to_pck(rng):
    from tlxcv_tpu.models.backbones.hrnet import HRNet
    from tlxcv_tpu.models.human_pose_estimation import PoseHighResolutionNet
    from tlxcv_tpu.tasks.human_pose_estimation import PCK, get_max_preds

    bb = HRNet(stage1_num_modules=1, stage1_num_blocks=(1,),
               stage1_num_channels=(8,),
               stage2_num_modules=1, stage2_num_blocks=(1, 1),
               stage2_num_channels=(8, 16),
               stage3_num_modules=1, stage3_num_blocks=(1, 1, 1),
               stage3_num_channels=(8, 16, 32),
               stage4_num_modules=1, stage4_num_blocks=(1, 1, 1, 1),
               stage4_num_channels=(8, 16, 32, 64))
    model = PoseHighResolutionNet(num_joints=4, backbone=bb)
    params, state = split(model)

    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    joints = rng.uniform(0.2, 0.8, size=(2, 4, 2))
    target = jnp.asarray(_gaussian_heatmaps(joints, (16, 16)))

    lp = pure(model, lambda m, v, t: m.loss_fn(m(v), t))
    tx = optax.adam(2e-3)
    ost = tx.init(params)

    @jax.jit
    def step(p, s, o):
        def lf(pp):
            loss, ns = lp(pp, s, x, target, training=True,
                          rngs=Rngs(jax.random.key(0)))
            return loss, ns

        (l, s2), g = jax.value_and_grad(lf, has_aux=True)(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), s2, o, l

    for _ in range(160):
        params, state, ost, loss = step(params, state, ost)

    out, _ = pure(model)(params, state, x, training=False)
    pck = PCK(threshold=0.5)
    pck.update(np.asarray(out), np.asarray(target))
    assert pck.result() > 0.9, pck.result()
    # decoded argmax positions land on the GT joints
    pred_xy, _ = get_max_preds(np.asarray(out))
    gt_xy, _ = get_max_preds(np.asarray(target))
    assert np.abs(pred_xy - gt_xy).max() <= 1.5


def test_pfld_overfits_to_nme(rng):
    from tlxcv_tpu.models.facial_landmark_detection import PFLD
    from tlxcv_tpu.tasks import NME, FacialLandmarkDetection

    model = FacialLandmarkDetection(PFLD())
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(2, 112, 112, 3)), jnp.float32)
    lm = rng.uniform(0.2, 0.8, size=(2, 68 * 2)).astype(np.float32)
    euler = rng.normal(size=(2, 3)).astype(np.float32) * 10
    target = (jnp.asarray(lm), jnp.asarray(euler))

    lp = pure(model, lambda m, v, t: m.loss_fn(m(v), t))
    tx = optax.adam(3e-3)
    ost = tx.init(params)

    @jax.jit
    def step(p, s, o):
        def lf(pp):
            loss, ns = lp(pp, s, x, target, training=True,
                          rngs=Rngs(jax.random.key(0)))
            return loss, ns

        (l, s2), g = jax.value_and_grad(lf, has_aux=True)(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), s2, o, l

    # 250 steps: the euler-weighted landmark loss ramps slowly while the
    # aux angles fit (weight = 1 - cos(err)); NME then collapses to ~0
    for _ in range(250):
        params, state, ost, loss = step(params, state, ost)

    # learning check runs in TRAIN mode (batch stats).  Eval-mode
    # equality is unattainable for a batch-2 memorization now that
    # running_var stores the torch-faithful UNBIASED batch variance:
    # eval normalization differs from training by n/(n-1) per BN
    # (n = B*H*W), and a zero-margin 2-sample fit amplifies that tiny
    # systematic offset through PFLD's ~60 serial BNs to NME ~0.8
    # (measured; torch behaves identically at batch 2).  Real-recipe
    # eval is covered by the hermetic NME accuracy bar, which trains at
    # calibration-sized batches.
    (pred_lm, _), _ = pure(model)(params, state, x, training=True,
                                  rngs=Rngs(jax.random.key(1)))
    nme = NME()
    nme.update(np.asarray(pred_lm), np.asarray(lm))
    assert nme.result() < 0.05, nme.result()

    # eval path still runs and stays finite (its quality bar lives in
    # demo/facial_landmark_detection/accuracy_check.py)
    (pred_eval, _), _ = pure(model)(params, state, x, training=False)
    assert np.isfinite(np.asarray(pred_eval)).all()
