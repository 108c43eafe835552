"""octcubem_tpu.models"""
