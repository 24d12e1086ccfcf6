from .transformer import EncoderConfig, TransformerEncoder, quick_gelu
from .bert import BertConfig, BertModel, convert_hf_bert_params
from .vit import (CLIPVisionModel, ViTConfig, clip_preprocess,
                  convert_hf_clip_vision_params)
from .mapping import MappingMLP, VisionMapping
from .flmr import (FLMRModelConfig, FLMRRetriever, l2_normalize,
                   punctuation_skiplist_ids, skiplist_mask)
from .dpr import DPRModelConfig, DPRRetriever

__all__ = [
    "EncoderConfig", "TransformerEncoder", "quick_gelu",
    "BertConfig", "BertModel", "convert_hf_bert_params",
    "CLIPVisionModel", "ViTConfig", "clip_preprocess",
    "convert_hf_clip_vision_params",
    "MappingMLP", "VisionMapping",
    "FLMRModelConfig", "FLMRRetriever", "l2_normalize",
    "punctuation_skiplist_ids", "skiplist_mask",
    "DPRModelConfig", "DPRRetriever",
]
