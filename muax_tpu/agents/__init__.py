"""(stub — populated in later phases)"""
