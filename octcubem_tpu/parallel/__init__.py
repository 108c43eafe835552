"""octcubem_tpu.parallel"""
