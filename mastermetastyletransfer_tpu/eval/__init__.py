from mastermetastyletransfer_tpu.eval.harness import (  # noqa: F401
    EvalReport, evaluate_grid, load_eval_images,
)
