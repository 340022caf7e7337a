"""memento_tpu.io"""
