"""Dataset pixel statistics.

Parity with the reference's static config constants (src/cfg.py:15-19):
Cityscapes BGR pixel means/vars in [0,255] space, plus the ImageNet
normalization constants used by the active path (train/assemble.py).
"""

import numpy as np

CITYSCAPE_PIXEL_MEANS = np.array([73.15835921, 82.90891754, 72.39239876])
CITYSCAPE_PIXEL_VARS = np.array([[[73.15835921, 82.90891754, 72.39239876]]])
