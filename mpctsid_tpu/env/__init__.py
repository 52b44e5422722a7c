from mpctsid_tpu.env.plant import ContactParams, PlantState, plant_step

__all__ = ["ContactParams", "PlantState", "plant_step"]
