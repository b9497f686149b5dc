"""Circle group over Mersenne31 (circle-STARK building blocks)."""

from .point import CirclePoint, CIRCLE_GENERATOR, M31  # noqa: F401
from .cosets import Coset  # noqa: F401
from .cfft import (  # noqa: F401
    cfft, icfft, order_cfft_result, order_icfft_input,
)
from .twiddles import get_twiddles  # noqa: F401
from .polynomial import evaluate_cfft, interpolate_cfft  # noqa: F401
from .cfft_device import (  # noqa: F401
    cfft_dev, icfft_dev, evaluate_cfft_dev, interpolate_cfft_dev,
)
