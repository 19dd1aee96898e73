"""One-command reference-checkpoint ingest: `.pth.tar` -> `.msgpack`.

Takes a reference pytracking checkpoint (the `.pth.tar` files from
/root/reference/MODEL_ZOO.md:50-59, saved by ltr/admin/loading.py), ports the
torch state_dict to flax variables with pytracking_tpu.utils.port_weights, and
writes `<network_path>/<name>.msgpack` (+ the constructor sidecar JSON) exactly
where the matching `pytracking_tpu/parameter/...` module looks for it — so
after this command, `run_tracker.py <tracker> <param>` runs the reference's
published weights:

    python scripts/ingest_checkpoint.py dimp50.pth.tar --family dimp50
    python scripts/ingest_checkpoint.py tomp50.pth.tar            # auto-detect

Coverage is enforced at ingest: every checkpoint key must be consumed by the
port (backbone fc head excepted) or the command fails — the same invariant as
tests/test_port_coverage.py, so weights cannot be silently dropped.
"""

import argparse
import functools
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pytracking_tpu.utils import port_weights as pw
from pytracking_tpu.utils.loading import save_network

# family -> (port fn, msgpack basename, constructor module, name, kwargs,
#            reference net_type for auto-detection)
_M = "pytracking_tpu.models"
REGISTRY = {
    "dimp50": (pw.port_dimpnet, "dimp50",
               f"{_M}.tracking.dimpnet", "dimpnet50", {}, None),
    "super_dimp": (pw.port_dimpnet, "super_dimp",
                   f"{_M}.tracking.dimpnet", "dimpnet50", {}, None),
    "super_dimp_simple": (pw.port_dimpnet, "super_dimp_simple",
                          f"{_M}.tracking.dimpnet", "dimpnet50_simple", {},
                          "SimpleSuperDiMPnet"),
    "dimp18": (functools.partial(pw.port_dimpnet, layers=(2, 2, 2, 2),
                                 block="basic", clf_feat_blocks=1),
               "dimp18", f"{_M}.tracking.dimpnet", "dimpnet18", {}, None),
    "prdimp50": (pw.port_dimpnet, "prdimp50",
                 f"{_M}.tracking.dimpnet", "klcedimpnet50", {}, "KLDiMPnet"),
    "prdimp18": (functools.partial(pw.port_dimpnet, layers=(2, 2, 2, 2),
                                   block="basic", clf_feat_blocks=1),
                 "prdimp18", f"{_M}.tracking.dimpnet", "klcedimpnet18", {}, None),
    "atom": (pw.port_atomnet, "atom_default",
             f"{_M}.tracking.atomnet", "atom_resnet18", {}, "ATOMnet"),
    "kys": (pw.port_kysnet, "kys",
            f"{_M}.tracking.kysnet", "kysnet_res50", {}, "KYSNet"),
    "lwl": (pw.port_lwlnet, "lwl_stage2",
            f"{_M}.lwl.lwl_net", "steepest_descent_resnet50",
            {"filter_size": 3, "num_filters": 16, "optim_iter": 5,
             "out_feature_dim": 512, "label_encoder_dims": [16, 32, 64]},
            "LWTLNet"),
    "rts50": (pw.port_rtsnet, "rts50",
              f"{_M}.rts.rts_net", "rts50", {}, "RTSNet"),
    "sta": (pw.port_stanet, "sta",
            f"{_M}.lwl.sta_net", "sta_resnet50",
            {"clf_feat_blocks": 0, "clf_final_conv": True}, "STANet"),
    "tomp50": (pw.port_tompnet, "tomp50",
               f"{_M}.tracking.tompnet", "tompnet50", {"feature_sz": 18}, None),
    "tomp101": (functools.partial(pw.port_tompnet, layers=(3, 4, 23, 3)),
                "tomp101", f"{_M}.tracking.tompnet", "tompnet101",
                {"feature_sz": 18}, None),
    "tamos_resnet50": (pw.port_tamosnet, "tamos_resnet50",
                       f"{_M}.tracking.tamosnet", "tamosnet_resnet50",
                       {"feature_sz": 36, "num_tokens": 10}, "TaMOsNet"),
    "keep_track_tcm": (pw.port_tcm, "keep_track_tcm",
                       f"{_M}.tcm.target_candidate_matching",
                       "target_candidate_matching_net_resnet50",
                       {"image_shape": [480, 480]}, "TargetCandiateMatchingNet"),
}


def load_reference_checkpoint(path: str):
    """torch.load a reference `.pth.tar` WITHOUT importing ltr: the pickled
    'constructor' entry references ltr classes, which a stub-returning
    Unpickler replaces (we only need 'net' and 'net_type')."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        pass

    class _Stub:
        def __init__(self, *a, **k):
            pass

        def __setstate__(self, state):
            pass

    class _StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except Exception:
                return _Stub

    class _PickleShim:
        Unpickler = _StubUnpickler

        @staticmethod
        def load(f, **kw):
            return _StubUnpickler(f).load()

    return torch.load(path, map_location="cpu", pickle_module=_PickleShim,
                      weights_only=False)


def detect_family(ckpt, path: str) -> str:
    """net_type string, checkpoint filename, then key-set heuristics."""
    net_type = ckpt.get("net_type") if isinstance(ckpt, dict) else None
    base = os.path.basename(path).lower()
    for fam, (_, _, _, _, _, ref_type) in REGISTRY.items():
        if net_type and ref_type == net_type:
            return fam
    for fam in sorted(REGISTRY, key=len, reverse=True):
        if fam.replace("_", "") in base.replace("_", "").replace("-", ""):
            return fam
    sd = ckpt.get("net", ckpt) if isinstance(ckpt, dict) else ckpt
    keys = set(sd)
    if any(k.startswith("predictor.") for k in keys):
        return "kys"
    if any("fpn" in k for k in keys):
        return "tamos_resnet50"
    if any(k.startswith("head.filter_predictor") for k in keys):
        return "tomp50"
    if any(k.startswith("clf_encoder") for k in keys):
        return "rts50"
    if any(k.startswith("bbox_encoder") for k in keys):
        return "sta"
    if any(k.startswith("target_model_segm") for k in keys):
        return "lwl"
    raise SystemExit(f"cannot auto-detect family for {path} "
                     f"(net_type={net_type!r}); pass --family")


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("checkpoint", help="reference .pth.tar path")
    ap.add_argument("--family", choices=sorted(REGISTRY), default=None)
    ap.add_argument("--out_dir", default=None,
                    help="override env_settings().network_path")
    ap.add_argument("--allow_unconsumed", action="store_true",
                    help="warn instead of fail on unconsumed checkpoint keys")
    args = ap.parse_args()

    ckpt = load_reference_checkpoint(args.checkpoint)
    family = args.family or detect_family(ckpt, args.checkpoint)
    sd_raw = ckpt.get("net", ckpt) if isinstance(ckpt, dict) else ckpt
    port, out_name, mod, ctor, ctor_kwargs, _ = REGISTRY[family]

    tsd = pw.TrackingStateDict(sd_raw)
    variables = port(tsd)
    unconsumed = {k for k in tsd.unconsumed()
                  if not k.endswith(("fc.weight", "fc.bias"))}
    if unconsumed:
        msg = (f"{family}: {len(unconsumed)} checkpoint keys NOT consumed: "
               f"{sorted(unconsumed)[:20]}")
        if not args.allow_unconsumed:
            raise SystemExit("FATAL " + msg + "  (use --allow_unconsumed to force)")
        print("WARNING " + msg)

    if args.out_dir is None:
        from pytracking_tpu.evaluation.environment import env_settings
        out_dir = env_settings().network_path
    else:
        out_dir = args.out_dir
    out = os.path.join(out_dir, out_name + ".msgpack")
    save_network(out, variables, mod, ctor, ctor_kwargs)
    n_keys = len(tsd)
    print(json.dumps({"family": family, "out": out, "ckpt_keys": n_keys,
                      "constructor": f"{mod}.{ctor}", "kwargs": ctor_kwargs}))


if __name__ == "__main__":
    main()
