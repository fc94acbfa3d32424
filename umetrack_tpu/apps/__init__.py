"""Entry-point applications (run as ``python -m umetrack_tpu.apps.<name>``).

Intentionally does not import the submodules: they are scripts with argparse
mains, and eager imports would double-import under ``-m`` execution.
"""

__all__ = [
    "load_eval",
    "run_eval_known_skeleton",
    "run_eval_unknown_skeleton",
    "run_inference_torch_data",
    "sequence_eval",
]
