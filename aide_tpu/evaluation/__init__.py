from aide_tpu.evaluation.case_eval import (  # noqa: F401
    CaseResult,
    dice3d_np,
    evaluate_cases,
    infer_cases,
)
from aide_tpu.evaluation.plots import save_comparison_figure  # noqa: F401
from aide_tpu.evaluation.report import (  # noqa: F401
    write_case_csv,
    write_case_masks,
    summarize,
)
