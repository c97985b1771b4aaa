from pandepth_tpu.stats.tables import output_prefix, write_tables, \
    write_site_depth

__all__ = ["output_prefix", "write_tables", "write_site_depth"]
