from pyjanitor_spark.functions import math  # noqa: F401
from pyjanitor_spark.functions.math import (  # noqa: F401
    apply_math,
    ecdf,
    exp,
    log,
    logit,
    normal_cdf,
    probit,
    sigmoid,
    softmax,
    z_score,
)
