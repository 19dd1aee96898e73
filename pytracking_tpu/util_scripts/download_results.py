"""Download published raw tracking results into the local results directory.

Re-design of reference `pytracking/util_scripts/download_results.py`
(download_results:137): the reference hard-codes a Google-Drive ID table for its own
result zips; here the link table is an external JSON manifest (URL per
"<tracker>/<param>.zip") so any published result set — including this framework's —
can be fetched and unpacked into env_settings().results_path for comparison plots.

    python -m pytracking_tpu.util_scripts.download_results manifest.json --trackers dimp
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import zipfile


def download_results(manifest_path: str, trackers=None, results_path=None):
    from pytracking_tpu.evaluation.environment import env_settings

    results_path = results_path or env_settings().results_path
    with open(manifest_path) as f:
        manifest = json.load(f)

    import urllib.request

    for tracker_name, files in manifest.items():
        if trackers and tracker_name not in trackers:
            continue
        out_dir = os.path.join(results_path, tracker_name)
        os.makedirs(out_dir, exist_ok=True)
        for fname, url in files.items():
            param_name = os.path.splitext(fname)[0]
            if os.path.isdir(os.path.join(out_dir, param_name)):
                print(f"skip {tracker_name}/{param_name} (exists)")
                continue
            print(f"fetch {tracker_name}/{fname}")
            with tempfile.TemporaryDirectory() as tmp:
                zip_path = os.path.join(tmp, fname)
                urllib.request.urlretrieve(url, zip_path)
                ex_dir = os.path.join(tmp, "ex")
                with zipfile.ZipFile(zip_path) as z:
                    z.extractall(ex_dir)
                dst = os.path.join(out_dir, param_name)
                # zips may contain a single top folder or loose .txt files
                entries = os.listdir(ex_dir)
                src = os.path.join(ex_dir, entries[0]) \
                    if len(entries) == 1 and os.path.isdir(
                        os.path.join(ex_dir, entries[0])) else ex_dir
                shutil.move(src, dst)
    print(f"Results under {results_path}")


def main():
    parser = argparse.ArgumentParser(description="Download published raw results.")
    parser.add_argument("manifest", type=str,
                        help="JSON: {tracker: {param.zip: url}}")
    parser.add_argument("--trackers", nargs="*", default=None)
    parser.add_argument("--results_path", type=str, default=None)
    args = parser.parse_args()
    download_results(args.manifest, args.trackers, args.results_path)


if __name__ == "__main__":
    main()
