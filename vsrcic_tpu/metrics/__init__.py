from vsrcic_tpu.metrics.cider import Cider, CiderScorer  # noqa: F401
from vsrcic_tpu.metrics.bleu import Bleu  # noqa: F401
from vsrcic_tpu.metrics.rouge import Rouge  # noqa: F401
from vsrcic_tpu.metrics.external import Meteor, Spice, ExternalMetricUnavailable  # noqa: F401
from vsrcic_tpu.metrics.meteor import NativeMeteor  # noqa: F401
from vsrcic_tpu.metrics.spice import NativeSpice  # noqa: F401
