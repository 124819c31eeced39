from vsrcic_tpu.decode.loops import forward_teacher_forcing, greedy_decode, sample_decode  # noqa: F401
from vsrcic_tpu.decode.beam import beam_search_joint  # noqa: F401
