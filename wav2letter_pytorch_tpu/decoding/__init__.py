from .decoder import (Decoder, GreedyDecoder, PrefixBeamSearchLMDecoder,
                      get_time_per_word, prefix_beam_search)

__all__ = ['Decoder', 'GreedyDecoder', 'PrefixBeamSearchLMDecoder',
           'get_time_per_word', 'prefix_beam_search']
