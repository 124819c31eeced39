from vsrcic_tpu.ops.assignment import hungarian_assign, greedy_assign_device  # noqa: F401
from vsrcic_tpu.ops.fused_attention import make_fused_group_attention  # noqa: F401
