"""Unified CLI: `python -m spnet_tpu <command> [args...]`.

Commands mirror the reference's top-level scripts (SURVEY.md §2 L6):

  train            train -> evaluate pipeline      (train_spnet.py)
  evaluate         score on a labeled dataset      (evaluate_spnet.py)
  predict          label-free batch inference      (predict_spnet.py)
  gen-fake-espi    synthesize fake ESPI data       (gen_fake_espi.py)
  setup-data       split + augment real data       (setup_data.py)
  augment          offline dataset inflation       (augment_preproc.py)
  parse-zooniverse crowd CSV -> per-image CSVs     (parse_zooniverse_csv.py)
  gen-bboxes       ellipse -> bbox CSV export      (gen_bboxes_csv.py)
  ellipse-editor   Tk annotation editor            (ellipse_editor.py)
  export           checkpoint -> StableHLO serving artifact (—)
  bench            single-chip benchmark           (—)
"""

from __future__ import annotations

import sys

_COMMANDS = {
    "train": "spnet_tpu.cli.train",
    "evaluate": "spnet_tpu.cli.evaluate",
    "predict": "spnet_tpu.cli.predict",
    "gen-fake-espi": "spnet_tpu.cli.gen_fake_espi",
    "setup-data": "spnet_tpu.cli.setup_data",
    "augment": "spnet_tpu.cli.augment_preproc",
    "parse-zooniverse": "spnet_tpu.cli.parse_zooniverse",
    "gen-bboxes": "spnet_tpu.cli.gen_bboxes",
    "ellipse-editor": "spnet_tpu.cli.ellipse_editor",
    "export": "spnet_tpu.cli.export",
}


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__)
        raise SystemExit(0)
    cmd = sys.argv[1]
    if cmd == "bench":
        import importlib.util
        import json
        import os

        import spnet_tpu

        root = os.path.dirname(os.path.dirname(
            os.path.abspath(spnet_tpu.__file__)))
        spec = importlib.util.spec_from_file_location(
            "bench", os.path.join(root, "bench.py"))
        bench_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench_mod)
        print(json.dumps(bench_mod.main()))
        return
    if cmd not in _COMMANDS:
        print(f"unknown command {cmd!r}\n")
        print(__doc__)
        raise SystemExit(2)
    import importlib

    mod = importlib.import_module(_COMMANDS[cmd])
    mod.main(sys.argv[2:])


if __name__ == "__main__":
    main()
