"""Host-side data pipeline: wav -> tokens -> fbank -> SpecAug -> batches.

Generator-stage chain replicating /root/reference/src/processor.py and
/root/reference/src/dataset.py semantics (same sample dict keys, same
augmentation math), with TPU-required length-bucketed static batching
replacing dynamic_batch (SURVEY.md §7 layer 3).
"""
