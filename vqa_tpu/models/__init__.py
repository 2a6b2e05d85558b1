"""Model zoo: encoders, VQA predictors, caption decoders, and composition."""

from vqa_tpu.models.encoder import BaseEncoder, RelationEncoder, CaptionEncoder, set_encoder
from vqa_tpu.models.predictor import (
    BasePredictor, BaseCaptionPredictor, PredictorwithCaption, set_predictor,
)
from vqa_tpu.models.generator import BaseDecoder, BUTDDecoder, set_decoder
from vqa_tpu.models.wrapper import (
    VQAModel, set_model, compute_score, instance_bce_with_logits,
    ce_for_language_model,
)

__all__ = [
    "BaseEncoder", "RelationEncoder", "CaptionEncoder", "set_encoder",
    "BasePredictor", "BaseCaptionPredictor", "PredictorwithCaption", "set_predictor",
    "BaseDecoder", "BUTDDecoder", "set_decoder",
    "VQAModel", "set_model", "compute_score", "instance_bce_with_logits",
    "ce_for_language_model",
]
