"""Offline data tooling (reference L0 layer, SURVEY.md §1): data.list
collection, global CMVN stats, vocab conversion. Same on-disk artifact
formats as the reference so data directories are interchangeable."""
