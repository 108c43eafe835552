"""octcubem_tpu.data"""
