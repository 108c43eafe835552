"""octcubem_tpu.train"""
