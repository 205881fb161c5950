from .acq import (
    EI, LCB, MACE, PI, UCB, AcqParams, Acquisition, GeneralAcq, Mean,
    MOMeanSigmaLCB, Sigma, log_ei, log_pi,
)
from .acq import ThompsonSampling
