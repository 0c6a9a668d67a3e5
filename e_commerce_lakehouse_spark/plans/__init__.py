# Pipeline compositions: medallion bronze → silver → gold flows built
# from the operator library.
