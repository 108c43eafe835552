"""octcubem_tpu.cli"""
