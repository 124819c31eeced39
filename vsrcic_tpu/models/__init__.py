from vsrcic_tpu.models.captioner import (  # noqa: F401
    CaptionerConfig,
    init_captioner_params,
    captioner_step,
    captioner_step_v,
    precompute_statics,
)
from vsrcic_tpu.models.s_ssp import (  # noqa: F401
    SSPConfig, init_ssp_params, ssp_forward_loss, ssp_generate,
    ssp_generate_fast)
from vsrcic_tpu.models.sinkhorn import SinkhornConfig, init_sinkhorn_params, sinkhorn_net_apply  # noqa: F401
