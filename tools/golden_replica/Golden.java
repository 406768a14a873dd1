import java.util.Random;

// Standalone behavioral replica of the reference generator+query semantics
// (reference: TpchDataGenerator.java / TpchQuery6.java) for parity checking.
public class Golden {
    static Random random = new Random(0);

    static int randomInt(int low, int high) { return random.nextInt(1 + high - low) + low; }

    static long nextLongBound(long n) {
        long bits, val;
        do {
            bits = (random.nextLong() << 1) >>> 1;
            val = bits % n;
        } while (bits - val + (n - 1) < 0L);
        return val;
    }

    static long partPrice(long partKey) {
        long price = 90000;
        price += (partKey / 10) % 20001;
        price += (partKey % 1000) * 100;
        return price;
    }

    public static void main(String[] args) {
        int START = 92001, TOTDATE = 2557;
        int OMIN = START, OMAX = START + TOTDATE - (121 + 30) - 1;
        // 1994 window as dense indices: 1992(366)+1993(365)=731
        int d94 = START + 731, d95 = d94 + 365;
        double sum = 0; long count = 0;
        for (int i = 0; i < 5_000_000; i++) {
            int quantity = randomInt(1, 50);
            double discount = randomInt(0, 10) / 100.0;
            long partKey = nextLongBound(1 + 2_000_000 - 1) + 1;
            double extendedPrice = partPrice(partKey) * quantity / 100.0;
            int orderDate = randomInt(OMIN, OMAX);
            int shipDate = orderDate + randomInt(1, 121);
            if (shipDate >= d94 && shipDate < d95 && discount >= 0.05 && discount <= 0.07 && quantity < 24) {
                sum += extendedPrice * discount; count++;
            }
        }
        System.out.println(sum + " " + count);
    }
}
