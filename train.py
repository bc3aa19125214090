"""Training CLI (reference train.py entry point).

Usage:
    python train.py --config configs/neus_dtu_scan63.yaml [--key:subkey value]
    python train.py --resume_dir logs/<expname>
"""
from neumesh_tpu.config import create_args_parser, load_config
from neumesh_tpu.train.loop import main_function

if __name__ == "__main__":
    parser = create_args_parser()
    args, unknown = parser.parse_known_args()
    config = load_config(args, unknown)
    main_function(config)
