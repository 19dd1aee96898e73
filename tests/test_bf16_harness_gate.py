"""bf16 accuracy gate at the whole-harness level (VERDICT r3 item 6).

PYTRACKING_TPU_BF16=1 buys +15% serving throughput but was never
accuracy-gated end to end. This runs OUR full product (run_dataset -> result
files -> extract_results) twice on the same on-disk synthetic benchmark — once
f32, once end-to-end bf16 (bf16 backbone compute + all f32 params stored
bf16, exactly what `maybe_bf16_variables` + `backbone_dtype` produce) — and
asserts the final AUC/precision tables agree within the same tolerance the
f32 build holds against the reference (±1.5 AUC), with both runs genuinely
tracking. This is the evidence that makes bf16 the serving default."""

import os
from dataclasses import replace

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tests.test_whole_harness_auc_parity import (_aucs_from_eval_data,
                                                 _run_my_stack,
                                                 _write_benchmark)

NOT_FOUND_THRESHOLD = 0.02


def _build_dimp(backbone_dtype=None, cast_bf16=False):
    import jax
    import jax.numpy as jnp

    from pytracking_tpu.models.tracking.dimpnet import dimpnet50
    from pytracking_tpu.trackers.dimp import DiMPParams, DiMPTracker

    params = DiMPParams(
        image_sample_size=288, search_area_scale=5.0, kernel_size=4,
        sample_memory_size=50, learning_rate=0.01,
        init_samples_minimum_weight=0.25, train_skipping=20,
        update_classifier=True, net_opt_iter=10, net_opt_update_iter=2,
        net_opt_hn_iter=1, window_output=True,
        perform_hn_without_windowing=True, use_augmentation=True,
        augmentation=(("fliplr", True), ("blur", ((3, 1), (1, 3), (2, 2)))),
        random_shift_factor=0.0, advanced_localization=True,
        target_not_found_threshold=NOT_FOUND_THRESHOLD,
        use_iou_net=False, num_init_random_boxes=0)
    net = dimpnet50(optim_iter=3, backbone_dtype=backbone_dtype)
    dummy = jnp.zeros((1, 1, 288, 288, 3))
    bb = jnp.array([[[100.0, 100.0, 50.0, 50.0]]])
    prop = jnp.array([[[[100.0, 100.0, 50.0, 50.0]]]])
    with jax.default_device(jax.devices("cpu")[0]):
        variables = dimpnet50(optim_iter=3).init(
            jax.random.PRNGKey(0), dummy, dummy, bb, prop, train=False)
    if cast_bf16:
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            variables)
    return DiMPTracker(params, net, variables)


@pytest.mark.filterwarnings("ignore")
def test_bf16_whole_harness_auc_gate(tmp_path):
    import jax.numpy as jnp

    bench = _write_benchmark(os.path.join(str(tmp_path), "frames"))

    f32 = _build_dimp()
    f32_aucs, _ = _run_my_stack(tmp_path, bench, {"dimp_f32": f32})

    bf16 = _build_dimp(backbone_dtype=jnp.bfloat16, cast_bf16=True)
    bf16_aucs, _ = _run_my_stack(tmp_path, bench, {"dimp_bf16": bf16})

    r, m = f32_aucs["dimp_f32"], bf16_aucs["dimp_bf16"]
    print("\n--- bf16 whole-harness gate ----------------------------------")
    print(f"{'mode':10s} {'AUC':>8s} {'P20':>8s} {'Pauc':>8s}")
    print(f"{'f32':10s} {r['auc']:8.2f} {r['prec20']:8.2f} {r['prec_auc']:8.2f}")
    print(f"{'bf16':10s} {m['auc']:8.2f} {m['prec20']:8.2f} {m['prec_auc']:8.2f}")
    print(f"{'delta':10s} {m['auc'] - r['auc']:8.2f} "
          f"{m['prec20'] - r['prec20']:8.2f} "
          f"{m['prec_auc'] - r['prec_auc']:8.2f}")

    assert r["auc"] > 30.0, \
        f"f32 run AUC {r['auc']:.1f}: benchmark not actually tracked"
    assert abs(m["auc"] - r["auc"]) <= 1.5, \
        f"bf16 AUC {m['auc']:.2f} vs f32 {r['auc']:.2f}"
    assert abs(m["prec_auc"] - r["prec_auc"]) <= 2.0
