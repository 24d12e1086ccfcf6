from .transformer import EncoderConfig, TransformerEncoder, quick_gelu
from .bert import BertConfig, BertModel, convert_hf_bert_params
from .vit import (CLIPVisionModel, ViTConfig, clip_preprocess,
                  convert_hf_clip_vision_params)
from .mapping import MappingMLP, VisionMapping
from .flmr import (FLMRModelConfig, FLMRRetriever, l2_normalize,
                   punctuation_skiplist_ids, skiplist_mask)
from .dpr import DPRModelConfig, DPRRetriever
from .t5 import T5Config, T5Model, convert_hf_t5_params, shift_right
from .generation import beam_generate, greedy_generate
from .rag import (GeneratorInputBuilder, get_retrieval_labels,
                  rag_loss_components, select_answers_by_joint_score)
from .lora import count_lora_params, init_lora, merge_lora
from .detection import AttrRCNN, DetectorConfig, convert_vinvl_params
from .captioner import (CaptionerConfig, OscarCaptioner,
                        convert_oscar_captioner_params, greedy_caption)
from .reranker import (CrossEncoderReranker, RerankerConfig,
                       RerankerTokenizer,
                       convert_hf_electra_reranker_params,
                       convert_hf_seqcls_bert_params)

__all__ = [
    "EncoderConfig", "TransformerEncoder", "quick_gelu",
    "BertConfig", "BertModel", "convert_hf_bert_params",
    "CLIPVisionModel", "ViTConfig", "clip_preprocess",
    "convert_hf_clip_vision_params",
    "MappingMLP", "VisionMapping",
    "FLMRModelConfig", "FLMRRetriever", "l2_normalize",
    "punctuation_skiplist_ids", "skiplist_mask",
    "DPRModelConfig", "DPRRetriever",
    "T5Config", "T5Model", "convert_hf_t5_params", "shift_right",
    "beam_generate", "greedy_generate",
    "GeneratorInputBuilder", "get_retrieval_labels", "rag_loss_components",
    "select_answers_by_joint_score",
    "count_lora_params", "init_lora", "merge_lora",
    "AttrRCNN", "DetectorConfig", "convert_vinvl_params",
    "CaptionerConfig", "OscarCaptioner", "convert_oscar_captioner_params",
    "greedy_caption",
    "CrossEncoderReranker", "RerankerConfig", "RerankerTokenizer",
    "convert_hf_electra_reranker_params", "convert_hf_seqcls_bert_params",
]
