"""octcubem_tpu.compat"""
