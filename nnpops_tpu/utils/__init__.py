from .water import make_water_box, WaterBox, TIP3P_CHARGES
