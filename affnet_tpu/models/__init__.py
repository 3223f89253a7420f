from .zoo import (REGISTRY, AffNetFast, AffNetFast2Par, AffNetFast4,  # noqa
                  AffNetFast4Rot, AffNetFast4RotNosc, AffNetFast5Rot,
                  AffNetFast52Rot, AffNetFast52RotL, AffNetFast52RotUp,
                  AffNetFastBias, AffNetFastScale, HardNet, HardTFeatNet,
                  OriNetFast, OriNetFast32, PatchNet)
from .handcrafted import AffineShapeEstimator, OrientationDetector  # noqa
from .sift import SIFTNet  # noqa
from .dense import AffNetFastFullConv  # noqa
from .yinet import YiNet  # noqa
from . import convert  # noqa
