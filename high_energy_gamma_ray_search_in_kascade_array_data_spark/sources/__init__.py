from high_energy_gamma_ray_search_in_kascade_array_data_spark.sources.catalog import TABLES, load_table, load_tables, register_views

__all__ = ["TABLES", "load_table", "load_tables", "register_views"]
