"""octcubem_tpu.ops"""
