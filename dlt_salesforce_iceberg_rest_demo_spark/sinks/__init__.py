from .dispositions import ParquetLake, WriteReport

__all__ = ["ParquetLake", "WriteReport"]
