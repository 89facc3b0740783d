from .dates import calendar_columns, sas_date_decode
from .exact import money_avg, money_sum

__all__ = ["calendar_columns", "sas_date_decode", "money_avg", "money_sum"]
