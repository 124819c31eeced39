from vsrcic_tpu.utils.rank_merge import verb_rank_merge  # noqa: F401
from vsrcic_tpu.utils.torch_import import nest_state_dict, import_torch_state_dict  # noqa: F401
