from mpctsid_tpu.native.runtime import PlanBuffer, RtExecutor, ensure_built

__all__ = ["PlanBuffer", "RtExecutor", "ensure_built"]
