from mpctsid_tpu.env.plant import ContactParams, PlantState, plant_step
from mpctsid_tpu.env.interface import Plant, Sensors, SimPlant

__all__ = ["ContactParams", "PlantState", "plant_step",
           "Plant", "Sensors", "SimPlant"]
