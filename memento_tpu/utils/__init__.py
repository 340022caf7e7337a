"""memento_tpu.utils"""
