"""Task-head regression tests (review findings r3)."""
import jax.numpy as jnp




def test_generate_target_numpy_matches_jitted():
    """GenerateTarget is pure numpy (no device dispatch in the data
    path) and must equal the on-device generate_heatmap_target."""
    import numpy as np

    from tlxcv_tpu.tasks.human_pose_estimation import (
        GenerateTarget, generate_heatmap_target)

    rng = np.random.default_rng(3)
    kp = np.concatenate([rng.uniform(-20, 280, size=(17, 2)),
                         rng.integers(0, 3, size=(17, 1)).astype(float)],
                        -1).astype(np.float32)
    _, (t_np, w_np) = GenerateTarget()((None, kp))
    t_j, w_j = generate_heatmap_target(kp)
    np.testing.assert_allclose(t_np, np.asarray(t_j), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(w_np, np.asarray(w_j), rtol=1e-6)


def test_ocr_task_eval_forward_runs_backbone():
    """Reference forward: identity when training, backbone otherwise."""
    import numpy as np

    from tlxcv_tpu.core.module import pure, split
    from tlxcv_tpu.tasks.ocr import OpticalCharacterRecognition

    class Net:
        pass

    from tlxcv_tpu import nn

    class Double(nn.Module):
        def __call__(self, x):
            return x * 2.0

    task = OpticalCharacterRecognition(Double())
    params, state = split(task)
    f = pure(task)
    x = jnp.ones((2, 3))
    train_out, _ = f(params, state, x, training=True)
    eval_out, _ = f(params, state, x, training=False)
    np.testing.assert_array_equal(np.asarray(train_out), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(eval_out), 2 * np.asarray(x))
