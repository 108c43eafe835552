"""octcubem_tpu.core"""
