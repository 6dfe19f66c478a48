"""Engine: batched jit/pjit prediction pipeline."""
from .predictor import (  # noqa: F401
    PredictionResult,
    Predictor,
    load_dataset_and_predict,
    predict_structure,
)
