"""MEANT model zoo — public names mirror `meant/__init__.py:1-11` in the
reference; src-era variants keep their reference module names."""

from .meant import (EmbeddingConfig, MlpHead, meant, meantPrice, meant_tweet,
                    meant_tweet_no_lag, meant_vision, meant_vqa)
from .meant_src import (LSTMEncoder, meantTweetPrice, meant_price, meant_src,
                        mlpEncoder)
from .meant_timesformer import (meant_mean_pooling, meant_mosi,
                                meant_timesformer)
from .pretrainers import meant_language_pretrainer, meant_vision_pretrainer
from .meant_v2 import meant_v2
from .teanet import teanet
from meant_tpu.nn.roberta import (ViltWrapper, bertweet_wrapper,
                                  roberta_mlm_wrapper, vl_BERT_Wrapper)

__all__ = [
    "EmbeddingConfig", "MlpHead", "meant", "meantPrice", "meant_tweet",
    "meant_tweet_no_lag", "meant_vision", "meant_vqa",
    "LSTMEncoder", "meantTweetPrice", "meant_price", "meant_src",
    "mlpEncoder", "meant_mean_pooling", "meant_mosi", "meant_timesformer",
    "meant_language_pretrainer", "meant_vision_pretrainer", "teanet",
    "ViltWrapper", "bertweet_wrapper", "roberta_mlm_wrapper",
    "vl_BERT_Wrapper", "meant_v2",
]
