from vsrcic_tpu.pipelines.sr_groups import (  # noqa: F401
    VerbGroup, batch_planner_inputs, extract_verb_groups)
from vsrcic_tpu.pipelines.eval_pipeline import CaptionJob, EvalPipeline  # noqa: F401
