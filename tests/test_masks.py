"""Golden tests of the mask builders against a direct numpy transcription of
the reference's semantics (patch_speech_encoder.py:30-77)."""

import numpy as np

from infinisst_tpu.core import masks as M


def ref_training_mask(seq_len, max_cache_size=None, blocksize=1):
    """Direct numpy transcription of get_attn_mask_training semantics."""
    blocksizes = [
        min(blocksize, seq_len - i * blocksize)
        for i in range((seq_len + blocksize - 1) // blocksize)
    ]
    mask = np.zeros((seq_len, seq_len), dtype=bool)
    start = 0
    for bs in blocksizes:
        end = start + bs
        mask[start:end, :end] = True
        start = end
    if max_cache_size is not None:
        for i in range(seq_len):
            mask[i, : max(0, i - max_cache_size)] = False
    return mask


def ref_inference_mask(seq_len, prefix_len, max_cache_size, blocksize=1):
    """Direct numpy transcription of get_attn_mask_inference semantics."""
    max_len = seq_len + min(prefix_len, max_cache_size)
    blocksizes = [
        min(blocksize, seq_len + prefix_len - i * blocksize)
        for i in range((seq_len + prefix_len + blocksize - 1) // blocksize)
    ]
    mask = np.zeros((seq_len, max_len), dtype=bool)
    start = 0
    for bs in blocksizes:
        end = start + bs
        if end > prefix_len:
            mask[
                max(0, start - prefix_len) : end - prefix_len,
                : end - max(0, prefix_len - max_cache_size),
            ] = True
        start = end
    for i in range(seq_len):
        mask[
            i,
            : max(0, i + prefix_len - max_cache_size)
            - max(0, prefix_len - max_cache_size),
        ] = False
    return mask


def test_block_causal_matches_reference():
    for seq, cache, bs in [(20, None, 4), (20, 6, 4), (17, 5, 4), (48, 24, 12)]:
        got = np.asarray(M.block_causal_mask(seq, cache, bs))
        want = ref_training_mask(seq, cache, bs)
        np.testing.assert_array_equal(got, want)


def test_streaming_chunk_matches_reference():
    # Our mask is over a static right-aligned KV buffer of width cap+seq;
    # the reference's is over the trimmed (dynamic) width.  Align them.
    for seq, prefix, cache, bs in [
        (12, 0, 24, 12),
        (12, 12, 24, 12),
        (12, 24, 24, 12),
        (12, 60, 24, 12),
        (8, 20, 16, 8),
    ]:
        cap = cache  # buffer capacity = max_cache_size
        got = np.asarray(
            M.streaming_chunk_mask(seq, prefix, cache, bs, cap + seq)
        )
        want = ref_inference_mask(seq, prefix, cache, bs)
        valid = min(prefix, cache)
        # columns [cap-valid, cap) are the cached keys; [cap, cap+seq) new.
        aligned = np.concatenate(
            [got[:, cap - valid : cap], got[:, cap:]], axis=1
        )
        np.testing.assert_array_equal(aligned, want, err_msg=str((seq, prefix)))
        # all other columns must be masked
        assert not got[:, : cap - valid].any()


def test_left_aligned_decode_mask():
    got = np.asarray(M.left_aligned_decode_mask(3, 10, 4))
    # query i sees slots < 4 + i + 1
    for i in range(3):
        for j in range(10):
            assert got[i, j] == (j < 4 + i + 1)
