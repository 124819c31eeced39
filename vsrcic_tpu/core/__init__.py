from vsrcic_tpu.core import nn  # noqa: F401
