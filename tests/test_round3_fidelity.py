"""Round-3 fidelity items: DiMPScoreJittering (reference ltr/models/kys/utils.py:35-79
wired at train_settings/kys/kys.py:136-140), OxUvA result writer
(reference pytracking/evaluation/running.py:13-55), ATOM probabilistic inference
params (reference pytracking/parameter/atom/atom_prob_ml.py), and the interactive
multi-object video loop (reference pytracking/evaluation/tracker.py:260-446)."""

import math

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# DiMPScoreJittering
# ---------------------------------------------------------------------------

def _score_label(rng, n=3, h=8, w=8):
    import jax.numpy as jnp

    score = jnp.asarray(rng.rand(n, h, w, 1), jnp.float32)
    label = np.zeros((n, h, w, 1), np.float32)
    label[:, 2, 2, 0] = 1.0  # target peak at (2,2)
    return score, jnp.asarray(label)


def test_score_jittering_identity_when_disabled():
    import jax
    from pytracking_tpu.models.kys.score_jitter import DiMPScoreJittering

    rng = np.random.RandomState(0)
    score, label = _score_label(rng)
    fn = DiMPScoreJittering()  # p_zero=0, p_distractor=0
    out = fn(jax.random.PRNGKey(0), score, label)
    np.testing.assert_allclose(np.asarray(out), np.asarray(score))


def test_score_jittering_enhances_distractor_peak():
    import jax
    from pytracking_tpu.models.kys.score_jitter import DiMPScoreJittering

    rng = np.random.RandomState(1)
    score, label = _score_label(rng)
    fn = DiMPScoreJittering(p_distractor=1.0, distractor_ratio=0.01,
                            max_distractor_enhance_factor=1.3,
                            min_distractor_enhance_factor=0.8)
    out = np.asarray(fn(jax.random.PRNGKey(3), score, label))
    s, l = np.asarray(score), np.asarray(label)
    for i in range(s.shape[0]):
        neg = s[i] * (l[i] < 1e-4)
        pos = s[i] * (l[i] > 0.2)
        tmax = pos.max()
        flat_id = int(neg.reshape(-1).argmax())
        changed = (out[i] != s[i]).reshape(-1)
        # exactly the background argmax pixel is rewritten, into the range
        # [0.8, 1.3] * target peak (reference utils.py:67-69)
        assert changed.sum() == 1 and changed[flat_id]
        v = out[i].reshape(-1)[flat_id]
        assert 0.8 * tmax - 1e-6 <= v <= 1.3 * tmax + 1e-6


def test_score_jittering_zeroes_map():
    import jax
    from pytracking_tpu.models.kys.score_jitter import DiMPScoreJittering

    rng = np.random.RandomState(2)
    score, label = _score_label(rng)
    fn = DiMPScoreJittering(p_zero=1.0, p_distractor=0.0)
    out = np.asarray(fn(jax.random.PRNGKey(0), score, label))
    np.testing.assert_allclose(out, 0.0)


def test_score_jittering_matches_reference_class():
    """Force both implementations down the deterministic branch (p_distractor=1,
    tiny ratio) and compare: identical everywhere except the background argmax,
    which both draw from the same uniform range."""
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from refshim import reference_root  # noqa: F401  (installs stubs)
    from ltr.models.kys.utils import DiMPScoreJittering as RefJitter

    import jax
    from pytracking_tpu.models.kys.score_jitter import DiMPScoreJittering

    rng = np.random.RandomState(3)
    n, h, w = 4, 6, 6
    s_np = rng.rand(n, h, w).astype(np.float32)
    l_np = np.zeros((n, h, w), np.float32)
    l_np[:, 1, 1] = 1.0

    ref = RefJitter(p_zero=0.0, distractor_ratio=0.01, p_distractor=1.0,
                    max_distractor_enhance_factor=1.3,
                    min_distractor_enhance_factor=0.8)
    torch.manual_seed(0)
    ref_out = ref(torch.from_numpy(s_np).clone(),
                  torch.from_numpy(l_np)).numpy()

    ours = DiMPScoreJittering(p_zero=0.0, distractor_ratio=0.01,
                              p_distractor=1.0,
                              max_distractor_enhance_factor=1.3,
                              min_distractor_enhance_factor=0.8)
    our_out = np.asarray(ours(jax.random.PRNGKey(0),
                              s_np[..., None], l_np[..., None]))[..., 0]

    for i in range(n):
        neg = s_np[i] * (l_np[i] < 1e-4)
        flat_id = int(neg.reshape(-1).argmax())
        mask = np.ones(h * w, bool)
        mask[flat_id] = False
        # untouched pixels identical to the input in BOTH implementations
        np.testing.assert_allclose(ref_out[i].reshape(-1)[mask],
                                   s_np[i].reshape(-1)[mask], rtol=1e-6)
        np.testing.assert_allclose(our_out[i].reshape(-1)[mask],
                                   s_np[i].reshape(-1)[mask], rtol=1e-6)
        tmax = (s_np[i] * (l_np[i] > 0.2)).max()
        for v in (ref_out[i].reshape(-1)[flat_id],
                  our_out[i].reshape(-1)[flat_id]):
            assert 0.8 * tmax - 1e-6 <= v <= 1.3 * tmax + 1e-6


def test_kys_actor_consumes_jittered_scores():
    """A jitter fn that blanks the appearance scores must change the KYS losses
    (proves the actor routes dimp scores through dimp_jitter_fn, reference
    actors/tracking.py:288-290)."""
    import jax.numpy as jnp
    from test_training_actors_extra import test_kys_actor_loss_and_grads  # noqa: F401
    # build the same tiny net/batch via the helper module pieces
    import jax
    from pytracking_tpu.models.backbones.resnet import ResNet
    from pytracking_tpu.models.bbreg.iou_net import AtomIoUNet
    from pytracking_tpu.models.classifier.features import ResidualBottleneck
    from pytracking_tpu.models.classifier.initializer import FilterInitializerLinear
    from pytracking_tpu.models.classifier.linear_filter import LinearFilter
    from pytracking_tpu.models.classifier.optimizer import DiMPSteepestDescentGN
    from pytracking_tpu.models.kys.response_predictor import ResponsePredictor
    from pytracking_tpu.models.tracking.kysnet import KYSNet
    from pytracking_tpu.training.actors.tracking import make_kys_actor

    d = 32
    backbone = ResNet(block="bottleneck", layers=(1, 1, 1, 1),
                      output_layers=("layer2", "layer3"), base_width=8)
    clf_fe = ResidualBottleneck(feature_dim=16, num_blocks=0, l2norm=True,
                                final_conv=True, norm_scale=math.sqrt(1 / (d * 16)),
                                out_dim=d)
    classifier = LinearFilter(
        filter_size=4,
        filter_initializer=FilterInitializerLinear(filter_size=4, feature_dim=d),
        filter_optimizer=DiMPSteepestDescentGN(num_iter=2, feat_stride=16,
                                               num_dist_bins=10,
                                               bin_displacement=0.5),
        feature_extractor=clf_fe)
    net = KYSNet(feature_extractor=backbone, classifier=classifier,
                 bb_regressor=AtomIoUNet(input_dim=(64, 128),
                                         pred_input_dim=(16, 16),
                                         pred_inter_dim=(16, 16)),
                 classification_layer="layer3",
                 bb_regressor_layer=("layer2", "layer3"),
                 predictor=ResponsePredictor(state_dim=4,
                                             representation_predictor_dims=(8,),
                                             conf_measure="entropy",
                                             dimp_thresh=0.05),
                 max_displacement=2)

    S, T, H = 2, 4, 64
    h = H // 16
    rng = np.random.RandomState(0)
    dummy = jnp.zeros((1, S, H, H, 3))
    bb = jnp.tile(jnp.array([[[20.0, 20.0, 24.0, 24.0]]]), (1, S, 1))
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy, bb, bb[:, :, None],
                         train=False)
    mf = jnp.zeros((S, h, h, d))
    ds = jnp.zeros((S, h, h, 1))
    v_pred = net.init(
        jax.random.PRNGKey(1), mf, mf, None, ds, ds,
        method=lambda m, a, b, c, e, f: m.predict_response(a, b, c, e,
                                                           init_label=f))
    params = {**variables["params"], **v_pred["params"]}
    bs = {**variables.get("batch_stats", {}), **v_pred.get("batch_stats", {})}
    batch = {
        "train_images": jnp.asarray(rng.rand(1, S, H, H, 3) * 255, jnp.float32),
        "train_anno": bb,
        "test_images": jnp.asarray(rng.rand(T, S, H, H, 3) * 255, jnp.float32),
        "test_label": jnp.asarray(
            np.exp(-0.5 * ((np.mgrid[0:h, 0:h] - h / 2) ** 2).sum(0))[None, None]
            * np.ones((T, S, 1, 1)), jnp.float32),
        "jitter_seed": jnp.asarray([7, 11], jnp.int32),
    }
    plain = make_kys_actor(net, train=False)
    blank = make_kys_actor(net, train=False,
                           dimp_jitter_fn=lambda k, s, l: jnp.zeros_like(s))
    _, (st0, _) = plain(params, bs, batch)
    _, (st1, _) = blank(params, bs, batch)
    assert np.isfinite(float(st1["Loss/total"]))
    assert float(st0["Loss/dimp_clf"]) != pytest.approx(
        float(st1["Loss/dimp_clf"]))


def test_oxuva_csv_writer_round_trip(tmp_path):
    """run_sequence on an oxuva-shaped sequence must write the OxUvA submission
    CSV (reference running.py:15-55): <vid>_<obj>.csv with normalised clipped
    boxes, integer frame numbers (init frame dropped) and a lowercase boolean
    presence decision; skip-if-done must key on the same file."""
    import csv

    from PIL import Image

    from pytracking_tpu.evaluation.data import Sequence
    from pytracking_tpu.evaluation.running import (_results_exist, run_sequence)

    img_h, img_w = 40, 60
    frame_dir = tmp_path / "frames"
    frame_dir.mkdir()
    frames = []
    for i in range(4):
        p = frame_dir / f"{i:06d}.png"
        Image.fromarray(np.zeros((img_h, img_w, 3), np.uint8)).save(p)
        frames.append(str(p))

    gt = np.array([[5.0, 5.0, 10.0, 10.0]] * 4)
    seq = Sequence("vid0001_obj1", frames, "oxuva", gt)

    bboxes = [[6.0, 6.0, 10.0, 10.0], [-4.0, 8.0, 10.0, 10.0],
              [55.0, 30.0, 20.0, 20.0]]
    scores = [0.9, 0.3, 0.7]

    class StubTracker:
        class params:
            object_presence_score_threshold = 0.55

        def initialize(self, image, info):
            self.i = 0
            return {}

        def track(self, image, info=None):
            out = {"target_bbox": bboxes[self.i],
                   "object_presence_score": scores[self.i]}
            self.i += 1
            return out

    class StubWrapper:
        name, parameter_name, run_id = "stub", "default", None
        results_dir = str(tmp_path / "results")
        segmentation_dir = str(tmp_path / "seg")

        def create_tracker(self, multiobj=False):
            return StubTracker()

    wrapper = StubWrapper()
    assert not _results_exist(wrapper, seq)
    run_sequence(seq, wrapper, debug=1)

    pred_file = tmp_path / "results" / "vid0001_obj1.csv"
    assert pred_file.is_file()
    assert _results_exist(wrapper, seq)

    with open(pred_file) as fp:
        rows = list(csv.DictReader(
            fp, fieldnames=["video", "object", "frame_num", "present", "score",
                            "xmin", "xmax", "ymin", "ymax"]))
    assert len(rows) == 3  # init frame dropped
    assert [r["video"] for r in rows] == ["vid0001"] * 3
    assert [r["object"] for r in rows] == ["obj1"] * 3
    assert [int(r["frame_num"]) for r in rows] == [1, 2, 3]
    assert [r["present"] for r in rows] == ["true", "false", "true"]
    # frame 1: plain normalisation
    assert float(rows[0]["xmin"]) == pytest.approx(6.0 / img_w)
    assert float(rows[0]["xmax"]) == pytest.approx(16.0 / img_w)
    assert float(rows[0]["ymin"]) == pytest.approx(6.0 / img_h)
    assert float(rows[0]["ymax"]) == pytest.approx(16.0 / img_h)
    # frame 2: clipped at 0; frame 3: clipped at 1
    assert float(rows[1]["xmin"]) == 0.0
    assert float(rows[2]["xmax"]) == 1.0 and float(rows[2]["ymax"]) == 1.0


def test_all_parameter_modules_importable():
    """Every parameter variant module (incl. the new atom_prob_ml /
    atom_gmm_sampl, reference pytracking/parameter/atom/atom_prob_ml.py) must
    import and expose parameters()."""
    import importlib
    import pkgutil

    import pytracking_tpu.parameter as proot

    count = 0
    for tracker_pkg in pkgutil.iter_modules(proot.__path__):
        if not tracker_pkg.ispkg:
            continue
        pkg = importlib.import_module(f"pytracking_tpu.parameter"
                                      f".{tracker_pkg.name}")
        for variant in pkgutil.iter_modules(pkg.__path__):
            mod = importlib.import_module(
                f"pytracking_tpu.parameter.{tracker_pkg.name}.{variant.name}")
            assert callable(getattr(mod, "parameters", None)), \
                f"{tracker_pkg.name}/{variant.name} lacks parameters()"
            count += 1
    assert count >= 28, count  # 26 round-2 variants + atom_prob_ml + atom_gmm_sampl


def test_atom_prob_params_match_reference():
    """atom_prob_ml / atom_gmm_sampl configs mirror reference
    parameter/atom/atom_prob_ml.py:89-97 / atom_gmm_sampl.py:89-97."""
    import inspect

    from pytracking_tpu.parameter.atom import atom_gmm_sampl, atom_prob_ml

    for mod, steps in ((atom_prob_ml, "(2e-4, 10e-4)"),
                       (atom_gmm_sampl, "(1e-2, 5e-2)")):
        src = inspect.getsource(mod)
        assert 'box_refinement_space="relative"' in src
        assert "box_refinement_iter=10" in src
        assert f"box_refinement_step_length={steps}" in src


@pytest.mark.filterwarnings("ignore")
def test_atom_relative_box_refinement_end_to_end():
    """The relative-space gradient-ascent refinement (reference atom.py:798-833)
    compiles and yields finite boxes on the synthetic moving-target sequence."""
    import jax
    import jax.numpy as jnp

    from test_atom_tracker import tiny_atomnet
    from test_dimp_tracker import make_frame
    from pytracking_tpu.trackers.atom import ATOMParams, ATOMTracker

    net = tiny_atomnet()
    params = ATOMParams(
        max_image_sample_size=96 ** 2, min_image_sample_size=96 ** 2,
        compressed_dim=16, sample_memory_size=10,
        init_CG_iter=12, init_GN_iter=3, CG_iter=2, hard_negative_CG_iter=2,
        train_skipping=4,
        augmentation=(("fliplr", True),),
        num_init_random_boxes=3, iounet_k=2,
        box_refinement_space="relative", box_refinement_iter=4,
        box_refinement_step_length=(2e-4, 10e-4))

    dummy = jnp.zeros((1, 1, 96, 96, 3))
    bb = jnp.array([[[30.0, 30.0, 20.0, 20.0]]])
    prop = jnp.array([[[[30.0, 30.0, 20.0, 20.0]]]])
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy, bb, prop,
                         train=False)
    tracker = ATOMTracker(params, net, variables)
    centers = [(60 + 3 * t, 60 + 2 * t) for t in range(4)]
    tracker.initialize(make_frame(*centers[0]),
                       {"init_bbox": [centers[0][1] - 10, centers[0][0] - 10,
                                      20, 20]})
    for t in range(1, 4):
        out = tracker.track(make_frame(*centers[t]))
        bbox = out["target_bbox"]
        assert len(bbox) == 4 and all(np.isfinite(bbox)), bbox


def test_kys_recipe_wires_score_jittering():
    """The KYS training recipe must construct DiMPScoreJittering with the
    reference's hyperparameters (ltr/train_settings/kys/kys.py:136-140)."""
    import inspect

    import pytracking_tpu.training.train_settings.kys.kys as recipe

    src = inspect.getsource(recipe)
    assert "DiMPScoreJittering" in src
    assert "distractor_ratio=0.1" in src and "p_distractor=0.3" in src
    assert "max_distractor_enhance_factor=1.3" in src
    assert "min_distractor_enhance_factor=0.8" in src
