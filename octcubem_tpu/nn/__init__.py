"""octcubem_tpu.nn"""
