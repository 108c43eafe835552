"""octcubem_tpu.utils"""
