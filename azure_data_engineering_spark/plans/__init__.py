from azure_data_engineering_spark.plans.inspect import formatted_plan, assert_pushed_filters, assert_no_cartesian

__all__ = ["formatted_plan", "assert_pushed_filters", "assert_no_cartesian"]
