from ripor_tpu.ops.beam_gather import beam_gather_blocks, beam_gather_rows

__all__ = ["beam_gather_rows", "beam_gather_blocks"]
