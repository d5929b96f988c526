"""MEANT model zoo — public names mirror `meant/__init__.py:1-11` in the
reference; src-era variants keep their reference module names."""

from .meant import (EmbeddingConfig, MlpHead, meant, meantPrice, meant_tweet,
                    meant_tweet_no_lag, meant_vision, meant_vqa)
from .meant_src import (LSTMEncoder, meantTweetPrice, meant_price, meant_src,
                        mlpEncoder)

__all__ = [
    "EmbeddingConfig", "MlpHead", "meant", "meantPrice", "meant_tweet",
    "meant_tweet_no_lag", "meant_vision", "meant_vqa",
    "LSTMEncoder", "meantTweetPrice", "meant_price", "meant_src",
    "mlpEncoder",
]
