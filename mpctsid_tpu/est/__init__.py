from mpctsid_tpu.est.filter import EstimatorState, estimator_init, estimator_update

__all__ = ["EstimatorState", "estimator_init", "estimator_update"]
