import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from phaser_spark import *
from phaser_spark.session import get_spark

spark = get_spark(master="local[4]", shuffle_partitions=4)

import os
import tempfile

wd = tempfile.mkdtemp()
src = os.path.join(wd, "employees.csv")
open(src, "w").write(
    """employeeNumber,firstName,lastName,payType,paidPer,payRate,bonusAmount,Status
1,Benjamin,Sisko,"salary","Year","188625","30000",Active
2,Kira,Nerys,"salary","Year","118625","20000",Active
,None,Garak,"salary","Year", 100000,,Inactive
3,Julian,Bashir,"salary","Year",142880,"25000",Active
"""
)


@row_step
def drop_rows_with_no_id(row, **kwargs):
    if not row["Employee ID"]:
        if row["Status"] == "Active":
            raise DataErrorException("Missing employee ID for active employee")
        elif row["Status"] == "Inactive":
            raise DropRowException(f"Employee {row['Last name']} has no ID, dropping")
        else:
            raise DataErrorException(f"Unknown status {row['Status']}")
    return row


@row_step
def combine_full_name(row, **kwargs):
    row["Full name"] = f"{row['First name']} {row['Last name']}"
    return row


@row_step
def calculate_annual_salary(row, **kwargs):
    rate = row["Pay rate"]
    mult = {"Hour": 40 * 52, "Day": 5 * 52, "Week": 52, "Month": 12, "Year": 1}
    row["salary"] = rate * mult.get(row["Pay period"], 0)
    return row


@row_step
def calculate_bonus_percent(row, **kwargs):
    if row.get("bonusAmount") and row["salary"] > 0:
        row["Bonus percent"] = row["bonusAmount"] / row["salary"]
    return row


class Validation(Phase):
    columns = [
        Column(name="Employee ID", rename="employeeNumber"),
        Column(name="First name", rename="firstName"),
        Column(name="Last name", rename="lastName", blank=False),
        FloatColumn(name="Pay rate", min_value=0.01, rename="payRate", required=True),
        Column(
            name="Pay type",
            rename="payType",
            allowed_values=["hourly", "salary", "exception hourly", "monthly", "weekly", "daily"],
            on_error=ON_ERROR_DROP_ROW,
            save=False,
        ),
        Column(name="Pay period", rename="paidPer"),
    ]
    steps = [drop_rows_with_no_id, check_unique("Employee ID")]


class Transformation(Phase):
    columns = [FloatColumn(name="Pay rate"), FloatColumn(name="bonusAmount")]
    steps = [combine_full_name, calculate_annual_salary, calculate_bonus_percent]


class EmployeePipeline(Pipeline):
    phases = [Validation, Transformation]


p = EmployeePipeline(working_dir=os.path.join(wd, "out"), source=src, spark=spark)
df = p.run()
df.orderBy("__phaser_row_num__").show(truncate=False)
print("row nums:", [r["__phaser_row_num__"] for r in df.select("__phaser_row_num__").orderBy("__phaser_row_num__").collect()])
print(p.report_errors_and_warnings())
print("files:", sorted(os.listdir(os.path.join(wd, "out"))))
print(open(os.path.join(wd, "out", "Transformation_output.csv")).read())
