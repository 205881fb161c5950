from .acq import (
    CEI, EI, LCB, MACE, PI, UCB, AcqParams, Acquisition, AddLCB, GeneralAcq,
    Mean, MOMeanSigmaLCB, Sigma, ThompsonSampling, log_ei, log_pi,
)
