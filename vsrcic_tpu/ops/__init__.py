from vsrcic_tpu.ops.assignment import hungarian_assign, greedy_assign_device  # noqa: F401
