"""Built-in plugins (datasets/tasks). Auto-discovered by
:func:`openpifpaf_tpu.plugin.register`."""
