"""Entry point mirroring the reference `run.py` CLI.

Usage: python run.py --test_scene_dir demo_data/synth_box --demo
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sixdof_tpu.app.run import build_parser, main  # noqa: E402
from sixdof_tpu.utils import set_logging_format, set_seed  # noqa: E402

if __name__ == "__main__":
    args = build_parser().parse_args()
    set_logging_format()
    set_seed(0)
    main(args)
