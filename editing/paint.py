"""Texture painting CLI (reference editing/paint.py): fine-tune the color
codes of paint-touched vertices with view-independent paint supervision and
background distillation."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neumesh_tpu.editing.paint_train import main_function, update_paint_config

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None, required=True)
    args, unknown = parser.parse_known_args()
    with open(args.config) as f:
        paint_config = json.load(f)
    main_config = update_paint_config(paint_config, args)
    main_function(main_config)
