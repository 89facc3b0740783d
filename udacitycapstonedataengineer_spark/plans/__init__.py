from .star import build_star, flagship_revenue_by_region_year

__all__ = ["build_star", "flagship_revenue_by_region_year"]
