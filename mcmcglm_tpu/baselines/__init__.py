from .advi import ADVIResult, advi_fit
from .ess_mv import EllipticalSliceGLM
from .hmc import HMCResult, hmc_sample
from .logdensity import make_log_posterior
from .mv_slice import HyperrectSliceGLM, LatentSliceGLM, QuantileSliceGLM
from .nuts import NUTSResult, nuts_sample
