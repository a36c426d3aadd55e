"""Decoding: batched greedy / beam RNN-T + CTC, streaming chunk scan."""
