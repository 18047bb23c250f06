from .models import ANALYTICS_MODELS, fact_earthquake_data, stg_earthquake
from .registry import ModelRegistry

__all__ = ["ANALYTICS_MODELS", "ModelRegistry", "fact_earthquake_data", "stg_earthquake"]
