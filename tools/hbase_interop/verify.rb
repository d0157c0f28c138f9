# Scan every version of every cell through REAL HBase read code and dump
# them in the harness's line format for diffing against expected_cells.txt.
# Run inside the hbase container:  hbase shell -n /bulk/verify.rb

java_import org.apache.hadoop.hbase.HBaseConfiguration
java_import org.apache.hadoop.hbase.TableName
java_import org.apache.hadoop.hbase.CellUtil
java_import org.apache.hadoop.hbase.client.ConnectionFactory
java_import org.apache.hadoop.hbase.client.Scan

table_spec = File.readlines('/bulk/out/table_spec.txt').map(&:strip)
table_name = table_spec[0]

def hex(bytes)
  bytes.to_a.map { |b| format('%02x', b & 0xff) }.join
end

conn = ConnectionFactory.createConnection(HBaseConfiguration.create)
table = conn.getTable(TableName.valueOf(table_name))
scan = Scan.new
scan.readAllVersions

lines = []
scanner = table.getScanner(scan)
scanner.each do |result|
  result.listCells.each do |cell|
    lines << [
      hex(CellUtil.cloneRow(cell)),
      String.from_java_bytes(CellUtil.cloneFamily(cell)),
      String.from_java_bytes(CellUtil.cloneQualifier(cell)),
      cell.getTimestamp.to_s,
      hex(CellUtil.cloneValue(cell)),
    ].join('|')
  end
end
scanner.close
table.close
conn.close

File.open('/bulk/out/observed_cells.txt', 'w') do |fh|
  lines.sort.each { |l| fh.puts(l) }
end
puts "observed #{lines.length} cells -> /bulk/out/observed_cells.txt"
exit 0
